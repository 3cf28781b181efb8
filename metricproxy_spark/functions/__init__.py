"""Expression-level helpers (pure Catalyst, no UDFs on the hot path)."""
