-- Closed-form twin of the REAL uncompressed-AVI encode->decode loop:
-- the Spark side writes a genuine RIFF/'AVI ' container per document
-- (2 + doc_id % 4 frames of a (8 + doc_id % 5) x (6 + doc_id % 3)
-- RGB pattern; r = (3x+5y+7f+d) % 256, g = (7x+y+11f+2d) % 256,
-- b = (x+11y+13f+3d) % 256) with bottom-up, 4-byte-padded, BGR DIB
-- frames, then re-parses the chunk tree and recomputes every column
-- FROM THE DECODED FRAMES. This oracle derives the same values by
-- unnesting the (frame, x, y) grid from doc_id alone; pos_weighted_r
-- weights each red sample by frame*h*w + y*w + x + 1, so any frame-
-- order, row-flip, BGR-swap, or stride-padding bug breaks parity even
-- when plain channel sums collide. All-integer contract; sums CAST to
-- BIGINT (DuckDB widens to HUGEINT).
WITH g AS (
    SELECT doc_id,
           2 + doc_id % 4 AS n,
           8 + doc_id % 5 AS w,
           6 + doc_id % 3 AS h
    FROM documents
),
fs AS (
    SELECT doc_id, n, w, h, unnest(range(n)) AS f FROM g
),
xs AS (
    SELECT doc_id, n, w, h, f, unnest(range(w)) AS x FROM fs
),
px AS (
    SELECT doc_id, n, w, h, f, x, unnest(range(h)) AS y FROM xs
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_frames,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(sum((3 * x + 5 * y + 7 * f + doc_id) % 256) AS BIGINT)
           AS sum_r,
       CAST(sum((7 * x + y + 11 * f + 2 * doc_id) % 256) AS BIGINT)
           AS sum_g,
       CAST(sum((x + 11 * y + 13 * f + 3 * doc_id) % 256) AS BIGINT)
           AS sum_b,
       CAST(sum((f * h * w + y * w + x + 1)
                * ((3 * x + 5 * y + 7 * f + doc_id) % 256)) AS BIGINT)
           AS pos_weighted_r
FROM px
GROUP BY doc_id, n, w, h
