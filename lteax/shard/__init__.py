"""Multi-chip / multi-host sharding: mesh construction, overlap-save halo
exchange, sharded bulk-decode pipelines (SURVEY.md §2.6 C4-C7)."""
