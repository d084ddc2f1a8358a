"""Minimal sktime `.ts` reader (fixture ingestion only).

The reference vendors a 554-line validating parser
(/root/reference/t2f/data/reader.py). The engine's canonical input is
the tokens table, so `.ts` support here is deliberately minimal: the
`@timeStamps false` layout used by the bundled BasicMotions fixture —
`@`-prefixed header, then one line per case, `:`-separated dimensions,
comma-separated floats, trailing class label (header format documented
at data/BasicMotions/BasicMotions_TRAIN.txt:1-13). `?` parses to NaN
(reader.py:167 semantics). Written from the format description, not
from the reference code.
"""

from __future__ import annotations

import numpy as np


def read_ts(path: str) -> tuple[list[list[np.ndarray]], list[str], dict]:
    """Returns (cases, labels, header): cases[i][s] is signal s of case i
    as a float64 array; labels[i] its class (empty when @classLabel false).
    """
    header: dict = {}
    cases: list[list[np.ndarray]] = []
    labels: list[str] = []
    in_data = False
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if not in_data and line.startswith("@"):
                if line.lower() == "@data":
                    in_data = True
                    continue
                parts = line[1:].split(" ", 1)
                header[parts[0].lower()] = parts[1] if len(parts) > 1 else ""
                continue
            if not in_data:
                continue
            has_label = header.get("classlabel", "false").split(" ")[0] == "true"
            fields = line.split(":")
            label = fields[-1] if has_label else ""
            dims = fields[:-1] if has_label else fields
            sigs = [
                np.array(
                    [float("nan") if v == "?" else float(v) for v in d.split(",")],
                    dtype=np.float64,
                )
                for d in dims
            ]
            cases.append(sigs)
            labels.append(label)
    return cases, labels, header


def bm_series_rows(path: str, split: str) -> list[dict]:
    """FIXTURES.md F2 shape: one row per (case, signal)."""
    cases, labels, _ = read_ts(path)
    rows = []
    for ci, (sigs, lab) in enumerate(zip(cases, labels)):
        for si, arr in enumerate(sigs):
            rows.append(
                {
                    "doc_id": f"bm_{split}_{ci:03d}_s{si}",
                    "values": [float(x) for x in arr],
                    "n_val": len(arr),
                    "source": lab,
                    "case_id": f"bm_{split}_{ci:03d}",
                    "signal": si,
                }
            )
    return rows
