"""Inference pipeline: preprocessing, tokenizers, the multi-round ChatWM
session, and the CLI (the reference's L6/L7 layers)."""
