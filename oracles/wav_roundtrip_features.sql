-- Closed-form twin of the REAL WAV encode->decode loop: the Spark side
-- synthesizes a PCM16 mono square wave per document (half-period
-- 8 + doc_id % 5 samples, n = 400 + (doc_id % 23) * 16 frames,
-- amplitude 12000, 8 kHz) through the stdlib `wave` codec, re-parses
-- the bytes, and recomputes every column FROM THE PARSED SAMPLES.
-- This oracle derives the same values analytically from doc_id alone:
--   n_bytes       = 44-byte canonical RIFF/fmt/data header + 2 bytes/frame
--   duration_us   = n * 125 (8 kHz divides 1e6 exactly)
--   zero_crossings: the square wave flips sign at every multiple of the
--                   half-period P <= n-1, so (n-1) // P
--   sample_sum    : full periods (2P) cancel; the trailing r = n % (2P)
--                   samples contribute +A for min(r, P) and -A for
--                   max(0, r - P)
-- All-integer contract: nothing can knife-edge.
SELECT doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(2 AS BIGINT) AS sample_width,
       CAST(n AS BIGINT) AS n_frames,
       CAST(44 + 2 * n AS BIGINT) AS n_bytes,
       CAST(n * 125 AS BIGINT) AS duration_us,
       CAST((n - 1) // p AS BIGINT) AS zero_crossings,
       CAST(12000 * (least(n % (2 * p), p)
                     - greatest(0, n % (2 * p) - p)) AS BIGINT)
           AS sample_sum
FROM (
    SELECT doc_id,
           8 + doc_id % 5 AS p,
           400 + (doc_id % 23) * 16 AS n
    FROM documents
)
