"""Shared canonicalization for the differential harnesses (driver_sim.py,
sf_diff.py): sorted-column, order-insensitive value hash of a pandas frame
— the same compare the spark-graft driver records in CORRECTNESS_r{N}."""

from __future__ import annotations

import datetime
import hashlib

import numpy as np
import pandas as pd


def _cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, (float, np.floating)):
        return "<null>" if pd.isna(v) else repr(float(v))
    if isinstance(v, (int, np.integer, bool)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return str(v)


def vhash(pdf: pd.DataFrame) -> tuple[str, int]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(tuple(_cell(v) for v in r) for r in pdf.itertuples(index=False))
    return hashlib.md5(repr(rows).encode()).hexdigest(), len(rows)
