#!/usr/bin/env python
"""Per-stage profile of a registered query — the "measure, don't
guess" loop.

    python tools/profile_query.py <sf_dir> <query> [repeat]

Runs the query (fresh local Ray session), consumes the result, and
prints total wall plus Ray Data's per-operator stats for the LAST
executed dataset (``ds.stats()``) when the result is a Dataset.
Repeat > 1 reports each run's wall so first-touch worker-spawn cost
is visible separately from the warm number.
"""

import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name = sys.argv[2]
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from skosconverter_ray.queries import QUERIES

    fn = QUERIES[name]
    last = None
    for i in range(repeat):
        t0 = time.perf_counter()
        res = fn(sf_dir)
        n = res.count() if hasattr(res, "count") and not hasattr(
            res, "columns") else len(res)
        wall = time.perf_counter() - t0
        print(f"run {i}: {wall:.2f}s rows={n}")
        last = res
    if hasattr(last, "stats"):
        print("\n=== ds.stats() of the returned dataset ===")
        print(last.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
