"""Hash-function and field constant tables (validated, see each module)."""
