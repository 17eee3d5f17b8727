"""Driver-side planning utilities: checkpoint manifests with lineage."""
