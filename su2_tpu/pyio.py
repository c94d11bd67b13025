"""SU2_PY-style I/O helpers (SU2/io capability).

Reference: SU2_PY/SU2/io — config read/modify/write, history parsing, and
restart/solution file naming used by the optimization workflows.  The
in-memory API (`Simulation`, `adjoint`, `tooling.*`) replaces pySU2's SWIG
wrapper; these helpers cover the file-level interop.
"""

from __future__ import annotations

import re

import numpy as np


def read_history(path: str) -> dict[str, np.ndarray]:
    """Parse a history.dat/.csv (Tecplot-style VARIABLES header + rows)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    names: list[str] = []
    rows: list[list[float]] = []
    for ln in lines:
        if ln.upper().startswith("VARIABLES"):
            names = re.findall(r'"([^"]+)"', ln)
            continue
        if ln.upper().startswith(("TITLE", "ZONE")):
            continue
        try:
            rows.append([float(t) for t in re.split(r"[,\s]+", ln) if t])
        except ValueError:
            continue
    data = np.asarray(rows)
    if not names and rows:
        names = [f"col{i}" for i in range(data.shape[1])]
    return {n: data[:, k] for k, n in enumerate(names) if k < data.shape[1]}


def read_config_raw(path: str) -> dict[str, str]:
    """Raw KEY -> value-string mapping of a .cfg (SU2.io.Config read)."""
    out: dict[str, str] = {}
    with open(path) as f:
        for raw in f:
            line = raw.split("%", 1)[0].strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            out[k.strip().upper()] = v.strip()
    return out


def write_config(path: str, options: dict[str, str]) -> None:
    """Write a .cfg from a raw mapping (SU2.io.Config write)."""
    with open(path, "w") as f:
        for k, v in options.items():
            f.write(f"{k}= {v}\n")


def update_config(path_in: str, path_out: str, updates: dict[str, str]):
    """Read-modify-write preserving unrelated options."""
    opts = read_config_raw(path_in)
    opts.update({k.upper(): str(v) for k, v in updates.items()})
    write_config(path_out, opts)
    return opts
