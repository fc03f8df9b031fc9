"""Interop with reference-format artifacts (FAISS indexes, timm/torch
checkpoints) so users of the reference can bring their trained models."""
