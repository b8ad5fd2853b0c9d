"""The five reference pipeline stages as DataFrame plan builders.

Each stage is a pure function: (source DataFrames, options) -> target
DataFrame.  Materialization (parquet/Delta write, MERGE) is the engine
runner's job — keeping plan construction lazy lets Catalyst fuse the whole
stage into a handful of shuffles.
"""
