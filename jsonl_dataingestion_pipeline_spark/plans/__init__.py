"""End-to-end pipeline assemblies."""
