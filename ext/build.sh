#!/bin/sh
# Build the SparkSessionExtensions jar with Spark's OWN bundled Scala
# compiler — no sbt/maven/network required (the compiler and every Spark
# dependency already sit in $SPARK_HOME/jars). Output:
#   ext/gbs-spark-extension.jar
set -e
cd "$(dirname "$0")"
SPARK_JARS="${SPARK_HOME:-/opt/spark}/jars"
CP=$(ls "$SPARK_JARS"/*.jar | tr '\n' ':')
rm -rf target/classes && mkdir -p target/classes
java -cp "$CP" scala.tools.nsc.Main \
  -classpath "$CP" \
  -d target/classes \
  src/main/scala/GbsSparkExtension.scala
jar cf gbs-spark-extension.jar -C target/classes .
echo "built $(pwd)/gbs-spark-extension.jar"
