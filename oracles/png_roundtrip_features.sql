-- Closed-form twin of the REAL PNG encode->decode loop: the Spark side
-- synthesizes an 8-bit RGB image per document (width 8 + doc_id % 7,
-- height 8 + doc_id % 5; r = (3x+5y+d) % 256, g = (7x+y+2d) % 256,
-- b = (x+11y+3d) % 256) through a from-spec stdlib PNG encoder, then
-- re-parses the container (CRC-verified chunk walk, IDAT inflate,
-- scanline unfilter) and recomputes every column FROM THE DECODED
-- PIXELS. This oracle derives the same values analytically by
-- unnesting the pixel grid from doc_id alone; pos_weighted_r weights
-- each red sample by its scanline position (y*w + x + 1), so any
-- pixel-permutation or row-order bug in the codec breaks parity even
-- when the plain channel sums collide. All-integer contract: nothing
-- can knife-edge. Sums CAST to BIGINT (DuckDB widens to HUGEINT).
WITH g AS (
    SELECT doc_id,
           8 + doc_id % 7 AS w,
           8 + doc_id % 5 AS h
    FROM documents
),
xs AS (
    SELECT doc_id, w, h, unnest(range(w)) AS x FROM g
),
px AS (
    SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(2 AS BIGINT) AS color_type,
       CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(sum((3 * x + 5 * y + doc_id) % 256) AS BIGINT) AS sum_r,
       CAST(sum((7 * x + y + 2 * doc_id) % 256) AS BIGINT) AS sum_g,
       CAST(sum((x + 11 * y + 3 * doc_id) % 256) AS BIGINT) AS sum_b,
       CAST(sum((y * w + x + 1) * ((3 * x + 5 * y + doc_id) % 256))
            AS BIGINT) AS pos_weighted_r
FROM px
GROUP BY doc_id, w, h
