"""Scalar/column function kits — all JVM-side built-ins (no Python UDFs
in the reference-surface path; SURVEY.md §2.10)."""
