"""Environment-compatibility shims (sandbox-only; no-ops on real clusters)."""
