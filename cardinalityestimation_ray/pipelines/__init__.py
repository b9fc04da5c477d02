"""End-to-end pipelines (the queries() surface). Import from submodules:

distinct, frequency, quantiles, membership, dedup, ann, windows, exact,
stats, joins, incremental.
"""
