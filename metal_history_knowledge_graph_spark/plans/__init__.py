"""Plans: end-to-end pipeline orchestration and the read-side query
catalog."""
