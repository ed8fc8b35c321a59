"""CLI tools mirroring the reference cmd/ layer (names and flags)."""
