"""Hierarchy checkpoint / resume.

The reference has no solver-state checkpointing; matrices round-trip via
PETSc binary / MatrixMarket (SURVEY.md §5). Here the whole setup product —
every level's A and P plus the solver configuration — snapshots to a
directory of .pm files + JSON, so an expensive setup can be reused across
jobs/restarts (the orbax-style equivalent for this framework)."""

from __future__ import annotations

import json
import pathlib

import numpy as np

from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.gallery.io import read_pm, write_pm
from raptor_tpu.multilevel.level import Level


def save_hierarchy(ml, path) -> None:
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    meta = {
        "num_levels": ml.num_levels,
        "n_shards": ml.levels[0].A.partition.n_shards,
        "solve_tol": ml.solve_tol,
        "max_iterations": ml.max_iterations,
        "relax_type": ml.relax_type.name,
        "num_smooth_sweeps": ml.num_smooth_sweeps,
        "relax_weight": ml.relax_weight,
        "row_bounds": [
            [int(v) for v in lvl.A.partition.row_bounds]
            for lvl in ml.levels],
    }
    (path / "meta.json").write_text(json.dumps(meta))
    for i, lvl in enumerate(ml.levels):
        write_pm(path / f"A{i}.pm", lvl.A.global_csr)
        if lvl.P is not None:
            write_pm(path / f"P{i}.pm", lvl.P.global_csr)


def load_hierarchy(path):
    """Returns a ParMultilevel-compatible object ready for DeviceHierarchy."""
    from raptor_tpu.core.types import RelaxType
    from raptor_tpu.multilevel.par_multilevel import ParMultilevel

    path = pathlib.Path(path)
    meta = json.loads((path / "meta.json").read_text())
    ml = ParMultilevel(0.0, relax_type=RelaxType[meta["relax_type"]])
    ml.solve_tol = meta["solve_tol"]
    ml.max_iterations = meta["max_iterations"]
    ml.num_smooth_sweeps = meta["num_smooth_sweeps"]
    ml.relax_weight = meta["relax_weight"]
    S = meta["n_shards"]

    levels = []
    for i in range(meta["num_levels"]):
        a = read_pm(path / f"A{i}.pm")
        rb = np.asarray(meta["row_bounds"][i], dtype=np.int64)
        part = Partition(a.n_rows, a.n_cols, S, rb, rb)
        pa = ParCSRMatrix(a, part)
        p = None
        pfile = path / f"P{i}.pm"
        if pfile.exists():
            pcsr = read_pm(pfile)
            rb_next = np.asarray(meta["row_bounds"][i + 1], dtype=np.int64)
            ppart = Partition(pcsr.n_rows, pcsr.n_cols, S, rb, rb_next)
            p = ParCSRMatrix(pcsr, ppart)
        levels.append(Level(A=pa, P=p))
    ml.levels = levels
    ml.duplicate_coarse()
    return ml
