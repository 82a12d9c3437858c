"""Small driver-side utilities (reference petk/tools.py parity).

Only ``key_exists`` lives here: every other reference tool (get_type,
get_description, is_outbound, find_slivers, get_location) is re-expressed
as distributed operators in ``logical_types`` / ``operators`` / ``geo``.
"""

from __future__ import annotations


def key_exists(d: dict, *keys) -> bool:
    """E4 — safe nested-dict probe (petk/tools.py:120-129): True iff
    ``d[keys[0]][keys[1]]...`` resolves. Non-dict intermediates are a
    miss, not an error."""
    node = d
    for k in keys:
        if not isinstance(node, dict) or k not in node:
            return False
        node = node[k]
    return True
