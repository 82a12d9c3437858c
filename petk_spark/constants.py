"""Logical type system and canonical null model.

Reference parity: petk/constants.py:3-11 defines a 7-value logical type
overlay and the canonical null set ``[None, np.nan, 'null', '']``.
"""

from __future__ import annotations

TYPE_BOOL = "BOOLEAN"
TYPE_DATE = "DATE"
TYPE_EMPTY = "EMPTY"
TYPE_GEO = "GEOMETRY"
TYPE_NUM = "NUMERIC"
TYPE_STR = "STRING"
TYPE_UNSUPPORTED = "UNSUPPORTED"

#: String sentinels canonicalized to NULL on ingest (petk/constants.py:11).
#: ``None``/``NaN`` are handled structurally (isNull / isnan), so only the
#: string members are listed here.
NULL_STRING_SENTINELS = ["null", ""]

#: Quantile probabilities profiled by describe (petk/tools.py:47).
QUANTILES = [0.05, 0.25, 0.5, 0.75, 0.95]

#: Labels for the quantile statistics, '{:.0%}' like the reference.
QUANTILE_LABELS = ["5%", "25%", "50%", "75%", "95%"]
