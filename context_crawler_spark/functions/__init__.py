"""Pure scalar/table functions shared by plan-time code, pandas UDFs, tests
and the sequential oracle. Single source of truth for every parity-critical
semantic (canonicalization, glob matching, extraction, chunking)."""
