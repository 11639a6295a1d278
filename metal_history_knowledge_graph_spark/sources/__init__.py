"""Sources: pages-table readers and the seeded synthetic corpus
generator (the engine's only data source in the sandbox — no external
data)."""
