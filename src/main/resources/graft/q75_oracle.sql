-- PINNED ORACLE (pin_oracle.py pattern, generated from a hash-verified
-- Verify run at sf0.01 — the driver correctness gate's scale factor;
-- valid ONLY for /root/testdata/sf0.01/embeddings.parquet, which is
-- frozen per TESTDATA.md). A 3-iteration Lloyd fit has no
-- single-statement SQL equivalent, but the fit is bit-deterministic:
-- exact int64/DECIMAL(38,0) arithmetic end-to-end, deterministic
-- doc-id-ordered init, ties broken by lowest centroid id
-- (VectorQuantizerSpec pins determinism, monotone distortion, and the
-- M-step against ground truth). k=8, iters=3 over the frozen corpus
-- therefore has exactly one correct answer — these rows.
SELECT * FROM (VALUES
(0, 51, 51830794999332.0, 891369014763238.0, 513700216088718.0),
(1, 63, 64153448667712.0, 891369014763238.0, 513700216088718.0),
(2, 57, 58239699990768.0, 891369014763238.0, 513700216088718.0),
(3, 65, 67042600645362.0, 891369014763238.0, 513700216088718.0),
(4, 56, 57323619910483.0, 891369014763238.0, 513700216088718.0),
(5, 72, 74175549547100.0, 891369014763238.0, 513700216088718.0),
(6, 73, 75107566800929.0, 891369014763238.0, 513700216088718.0),
(7, 63, 64177559872023.0, 891369014763238.0, 513700216088718.0)
) AS t(cid, n_vec, total_distortion, first_iter_distortion, last_iter_distortion) ORDER BY cid
