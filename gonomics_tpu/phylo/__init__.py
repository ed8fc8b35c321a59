"""Phylogenetics: trees, ancestral reconstruction (reference:
expandedTree, reconstruct, phylo)."""
