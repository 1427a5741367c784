"""Post-processing tools for run artifacts (traces, experiment CSVs)."""
