"""Pure-Python/numpy kernels executed inside Arrow pandas-UDF stages.

Each kernel is deterministic (no RNG, no wall clock, thread-count
independent) so the same input produces byte-identical output at any
parallelism level — required by the scaling bench and the P/R gate
(SURVEY.md §4 item 4).
"""
