"""Command-line interface.

Mirrors the reference binary (``src/main.rs:18-29``):

* ``python -m flechasdb_tpu generate [path]`` — build a database from
  5000×1024 normalized random vectors (P=10, D=8, C=25, ``main.rs:31-38``),
  query it, and save it (default path ``testdb``), printing per-phase event
  timings.
* ``python -m flechasdb_tpu load <path>`` — load a stored database and run
  two query rounds to show cold (lazy loads) vs warm latency
  (``main.rs:151-222``), fetching the ``datum_id`` attribute per result.

Timings print in μs like the reference so outputs are directly comparable.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from . import events as ev
from .build import DatabaseBuilder
from .io import LocalFileSystem
from .serialize import save_database
from .stored import load_database

N, M, D, P, C = 5000, 1024, 8, 10, 25
K, NP = 10, 3


class _Timer:
    """Per-phase event stopwatch (the ``event_time`` pattern in
    ``main.rs:52-94``)."""

    def __init__(self, prefix: str = "") -> None:
        self.t = time.perf_counter()
        self.prefix = prefix

    def restart(self) -> None:
        self.t = time.perf_counter()

    def us(self) -> int:
        return int((time.perf_counter() - self.t) * 1e6)

    def report(self, what: str) -> None:
        print(f"{self.prefix}{what} in {self.us()} μs")


def _build_events(timer: _Timer):
    def handler(e: ev.Event) -> None:
        if isinstance(e, (ev.StartingIdAssignment, ev.StartingPartitioning,
                          ev.StartingSubvectorDivision)):
            timer.restart()
        elif isinstance(e, ev.StartingQuantization) and e.division == 0:
            timer.restart()
        elif isinstance(e, ev.FinishedIdAssignment):
            timer.report("assigned vector IDs")
        elif isinstance(e, ev.FinishedPartitioning):
            timer.report("partitioned data")
        elif isinstance(e, ev.FinishedSubvectorDivision):
            timer.report("divided data")
        elif isinstance(e, ev.FinishedQuantization):
            timer.report(f"quantized division {e.division}")
            timer.restart()
    return handler


def _query_events(timer: _Timer):
    def handler(e: ev.Event) -> None:
        if isinstance(e, (ev.StartingQueryInitialization,
                          ev.StartingPartitionSelection,
                          ev.StartingPartitionQuery,
                          ev.StartingResultSelection)):
            timer.restart()
        elif isinstance(e, ev.FinishedQueryInitialization):
            timer.report("initialized query")
        elif isinstance(e, ev.FinishedPartitionSelection):
            timer.report("selected partitions")
        elif isinstance(e, ev.FinishedPartitionQuery):
            timer.report(f"queried partition {e.partition_index}")
        elif isinstance(e, ev.FinishedResultSelection):
            timer.report("selected results")
    return handler


def generate(path: str = "testdb") -> None:
    rng = np.random.default_rng()
    t = _Timer()
    data = rng.random((N, M), dtype=np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    t.report("prepared data")

    t.restart()
    db = (DatabaseBuilder(data)
          .with_partitions(P)
          .with_divisions(D)
          .with_clusters(C)
          .build(_build_events(_Timer())))
    t.report("built database")

    for i in range(0, N, 2):  # odd vectors stay attribute-less
        db.set_attribute_at(i, ("datum_id", str(i)))

    qv = rng.random(M, dtype=np.float32)
    qv /= np.linalg.norm(qv)
    t.restart()
    results = db.query_with_events(qv, K, NP, _query_events(_Timer()))
    t.report("queried k-NN")
    for i, r in enumerate(results):
        print(f"{i}: {r}")

    t.restart()
    save_database(db, LocalFileSystem(path))
    t.report("saved database")


def load(path: str) -> None:
    import pathlib

    p = pathlib.Path(path)
    if p.is_dir():  # convenience: a directory with exactly one root manifest
        roots = sorted(p.glob("*.binpb"))
        if len(roots) != 1:
            print(f"expected exactly one root manifest in {path}, "
                  f"found {len(roots)}", file=sys.stderr)
            raise SystemExit(1)
        base, root_name = p, roots[0].name
    else:  # reference form: path to the root .binpb file (main.rs:151-161)
        base, root_name = p.parent, p.name
    print(f"loading database from {path!r}")
    t = _Timer()
    db = load_database(LocalFileSystem(base), root_name)
    t.report("loaded database")

    rng = np.random.default_rng()
    qv = rng.random(db.vector_size, dtype=np.float32)
    qv /= np.linalg.norm(qv)
    for r in range(2):  # cold then warm (main.rs:165-221)
        t.restart()
        results = db.query_with_events(
            qv, K, NP, _query_events(_Timer(prefix=f"[{r}] ")))
        t.report(f"[{r}] queried k-NN")
        t.restart()
        for i, res in enumerate(results):
            datum_id = res.get_attribute("datum_id")
            print(f"{i}: datum_id={datum_id!r}, {res.vector_id}")
        t.report(f"[{r}] listed results")


def main(argv: list[str]) -> int:
    if len(argv) >= 1 and argv[0] == "generate":
        generate(*argv[1:2])
        return 0
    if len(argv) >= 2 and argv[0] == "load":
        load(argv[1])
        return 0
    print("usage: python -m flechasdb_tpu [generate [path] | load <path>]",
          file=sys.stderr)
    return 1


def _console_entry() -> int:
    """``flechasdb-tpu`` console script (pyproject ``[project.scripts]``)."""
    return main(sys.argv[1:])


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
