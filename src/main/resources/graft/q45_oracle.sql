-- PINNED ORACLE (pin_oracle.py pattern): expected contract-table rows for
-- the frozen fixture tree composed from /root/reference/contracts (demo
-- metadata folder + Bueno721Drop etherscan dump). Generated from a Verify
-- run whose ingest semantics are independently pinned by ContractPipelineSpec
-- goldens (classification, content-hash, coercions); guards regressions, is
-- not independent ground truth for the hash values themselves.
SELECT * FROM (VALUES
('a61e436544d2af5dbcd58944d9762866', 'Bueno721Drop', 'json', 1, 'v0.8.17+commit.8df45f5f', 500, TRUE),
('a91a8aff79cb911b65fe2a495d0ad220', 'AdvancedCounter', 'multi_sol', 4, '0.8.19', 200, FALSE)
) AS t(id, name, source_type, n_files, compiler_version, runs, optimization_used) ORDER BY id
