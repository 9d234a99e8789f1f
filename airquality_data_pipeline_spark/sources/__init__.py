"""Source adapters: fixture parquet scans, the synthetic measurement
generator, and the rate-limited REST DataSource scaffold (SURVEY.md §2.1)."""
