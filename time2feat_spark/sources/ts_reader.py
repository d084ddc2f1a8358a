"""Minimal sktime `.ts` reader (fixture ingestion only).

The reference vendors a 554-line validating parser
(/root/reference/t2f/data/reader.py). The engine's canonical input is
the tokens table, so `.ts` support here is deliberately small but
covers both layouts the reference accepts:

- `@timeStamps false`: one line per case, `:`-separated dimensions,
  comma-separated floats, trailing class label (the bundled
  BasicMotions fixture, header documented at
  data/BasicMotions/BasicMotions_TRAIN.txt:1-13);
- `@timeStamps true`: dimensions as `(ts,val),(ts,val),...` tuple rows
  with integer-index OR datetime timestamps (reader.py:169,305-393
  semantics) — datetimes become epoch-ms int64.

`?` parses to NaN (reader.py:167 semantics). Written from the format
description, not from the reference code.
"""

from __future__ import annotations

import numpy as np


def _parse_dim(d: str) -> tuple[np.ndarray, np.ndarray | None]:
    """One dimension string -> (values, timestamps|None)."""
    d = d.strip()
    if not d.startswith("("):
        vals = np.array(
            [float("nan") if v == "?" else float(v) for v in d.split(",")],
            dtype=np.float64,
        )
        return vals, None
    # tuple rows: (ts,val),(ts,val),...  — ts may itself contain ','-free
    # datetimes or integer indices; val is after the LAST comma
    pairs = d[1:-1].split("),(")
    ts_list: list[int] = []
    vals_list: list[float] = []
    for p in pairs:
        ts_s, v_s = p.rsplit(",", 1)
        v_s = v_s.strip()
        vals_list.append(float("nan") if v_s == "?" else float(v_s))
        ts_s = ts_s.strip()
        try:
            ts_list.append(int(ts_s))
        except ValueError:
            ms = np.datetime64(ts_s.replace(" ", "T"), "ms").astype(np.int64)
            ts_list.append(int(ms))
    return (
        np.asarray(vals_list, dtype=np.float64),
        np.asarray(ts_list, dtype=np.int64),
    )


def _split_dims(line: str) -> list[str]:
    parts: list[str] = []
    cur: list[str] = []
    depth = 0
    for ch in line:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == ":" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def read_ts(path: str) -> tuple[list[list[np.ndarray]], list[str], dict]:
    """Returns (cases, labels, header): cases[i][s] is signal s of case i
    as a float64 array; labels[i] its class (empty when @classLabel
    false). Tuple-row layouts parse too (timestamps dropped — use
    read_ts_timestamps to keep them)."""
    cases_v, _cases_t, labels, header = read_ts_timestamps(path)
    return cases_v, labels, header


def read_ts_timestamps(
    path: str,
) -> tuple[
    list[list[np.ndarray]], list[list[np.ndarray | None]], list[str], dict
]:
    """Full form: (values, timestamps, labels, header); timestamps[i][s]
    is int64 (epoch-ms for datetimes, raw index otherwise) or None for
    `@timeStamps false` layouts."""
    header: dict = {}
    cases_v: list[list[np.ndarray]] = []
    cases_t: list[list[np.ndarray | None]] = []
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
            # ':' separates dimensions ONLY outside parentheses —
            # datetime timestamps inside tuples contain ':' themselves
            fields = _split_dims(line)
            label = fields[-1] if has_label else ""
            dims = fields[:-1] if has_label else fields
            parsed = [_parse_dim(d) for d in dims]
            cases_v.append([p[0] for p in parsed])
            cases_t.append([p[1] for p in parsed])
            labels.append(label)
    return cases_v, cases_t, labels, header


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
