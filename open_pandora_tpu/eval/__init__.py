"""Evaluation harnesses: VBench-I2V generation, standalone DynamiCrafter
batch inference (per-host prompt sharding), throughput benchmarking."""
