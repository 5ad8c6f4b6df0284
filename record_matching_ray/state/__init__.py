"""Checkpoint manifests + counters (lineage per stage)."""
