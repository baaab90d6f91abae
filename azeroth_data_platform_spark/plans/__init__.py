"""Pipeline composition — the thin job-runner replacing the reference's Dagster DAG."""
