"""Multi-chip sharding (jax.sharding mesh utilities)."""
