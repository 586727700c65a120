"""Batch data-processing operator battery over the driver's testdata tables.

Each public function takes ``sf_dir`` (a ``/root/testdata/sfX`` directory) and
returns a small result (pyarrow Table / pandas DataFrame) or a Dataset.  These
are the ``queries()`` entries of ``__ray_entry__``; SQL-expressible ones have
matching ``oracle_sql()`` strings checked by the driver against DuckDB.

Float discipline: oracle-checked outputs avoid order-dependent float sums —
integer-valued aggregates stay exact, money-like sums are rounded to whole
units (fp64 error bounds are orders of magnitude below 0.5 at these scales),
and similarity rankings return ids, not scores.
"""
