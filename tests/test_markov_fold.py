"""Parity pins for the packed-fold Markov rewrites (ADVICE r6).

``event_markov_stationary`` and ``markov_removal_attribution`` run their
power/value iterations INSIDE one SQL ``aggregate(sequence(...))`` fold over a
packed (states, edges) row.  The equivalence argument vs the former
join/aggregate formulation is subtle: a state's vector entry must be NULL
exactly when the join form would carry NO row for it, across 10-12 rounds.
These tests replay both queries on a toy chain against a pure-Python integer
reference that implements the join-form semantics literally, covering

  - a state with no inbound edge from any present state (its entry goes NULL
    after round 1 and must drop out of the result), and
  - a removal scenario that severs START entirely (the scenario row must
    vanish, not surface as 0).
"""

from __future__ import annotations

import pytest


def _ratio6(num: int, den: int) -> float:
    """exact_ratio_round6_wide in pure ints: half-up at 1e-6, exact double."""
    sgn = -1.0 if num < 0 else 1.0
    return sgn * ((abs(num) * 2_000_000 + den) // (2 * den)) / 1e6


def _p6(c: int, ra: int) -> int:
    return (c * 2_000_000 + ra) // (2 * ra)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type).  Writes the events
    table shape catalog.table expects (value/props present but unused)."""
    import datetime as dt

    data = [
        (
            eid,
            dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
            + dt.timedelta(microseconds=ts_us),
            uid,
            et,
            1.0,
            "{}",
        )
        for (eid, ts_us, uid, et) in rows
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


class TestEventMarkovStationaryFold:
    def test_matches_join_form_reference_with_no_inbound_state(
        self, spark, tmp_path
    ):
        from stellar_etl_spark.queries import event_markov_stationary

        # user1: C A B A B    user2: C A B
        # transitions: (C,A)x2 (A,B)x3 (B,A)x1 — state C has NO inbound
        # edge, so its pi entry must go NULL and its row must drop.
        rows = []
        eid = 0
        for uid, seq in [(1, "CABAB"), (2, "CAB")]:
            for i, t in enumerate(seq):
                rows.append((eid, i * 1_000_000, uid, t))
                eid += 1
        sf = _write_events(spark, tmp_path, rows)

        got = {
            r.event_type: (r.pi_scaled, r.pi_normalized)
            for r in event_markov_stationary(spark, sf).collect()
        }

        # ---- pure-Python join-form reference ----
        from collections import Counter

        trans = Counter()
        for uid, seq in [(1, "CABAB"), (2, "CAB")]:
            for a, b in zip(seq, seq[1:]):
                trans[(a, b)] += 1
        ra = Counter()
        for (a, _), c in trans.items():
            ra[a] += c
        p6 = {(a, b): _p6(c, ra[a]) for (a, b), c in trans.items()}
        states = sorted({a for a, _ in p6} | {b for _, b in p6})
        w = {s: 200_000 for s in states}
        for _ in range(12):
            new = {}
            for s in states:
                inbound = [
                    (a, p)
                    for (a, b), p in p6.items()
                    if b == s and w[a] is not None
                ]
                new[s] = (
                    (sum(w[a] * p for a, p in inbound) + 500_000) // 1_000_000
                    if inbound
                    else None
                )
            w = new
        tot = sum(v for v in w.values() if v is not None)
        expect = {
            s: (v, _ratio6(v, tot))
            for s, v in w.items()
            if v is not None
        }

        assert "C" not in got  # no-inbound state dropped, not zero
        assert got == expect


class TestMarkovRemovalFold:
    def test_matches_join_form_reference_with_missing_start_scenario(
        self, spark, tmp_path
    ):
        from stellar_etl_spark.queries import markov_removal_attribution

        # Every journey begins with 'view', so removing 'view' severs START
        # from the chain entirely: the 'view' scenario row must VANISH
        # (join form emits no START row), not read as zero effect.
        #   u1: view click purchase   u2: view purchase
        #   u3: view click signup (no conversion)
        rows = []
        eid = 0
        for uid, seq in [
            (1, ["view", "click", "purchase"]),
            (2, ["view", "purchase"]),
            (3, ["view", "click", "signup"]),
        ]:
            for i, t in enumerate(seq):
                rows.append((eid, i * 1_000_000, uid, t))
                eid += 1
        sf = _write_events(spark, tmp_path, rows)

        got = {
            r.channel: (
                r.p_full_scaled,
                r.p_removed_scaled,
                r.removal_effect,
                r.attribution_share,
            )
            for r in markov_removal_attribution(spark, sf).collect()
        }

        # ---- pure-Python join-form reference ----
        from collections import Counter

        trans = Counter()
        for uid, seq in [
            (1, ["view", "click", "purchase"]),
            (2, ["view", "purchase"]),
            (3, ["view", "click", "signup"]),
        ]:
            if "purchase" in seq:
                pre = seq[: seq.index("purchase")]
                term = "CONV"
            else:
                pre = seq
                term = "NULL"
            path = ["START"] + pre
            for a, b in zip(path, path[1:]):
                trans[(a, b)] += 1
            trans[(path[-1], term)] += 1
        ra = Counter()
        for (a, _), c in trans.items():
            ra[a] += c
        p6_all = {(a, b): _p6(c, ra[a]) for (a, b), c in trans.items()}

        def pconv(removed):
            edges = {
                (a, b): p
                for (a, b), p in p6_all.items()
                if a != removed and b != removed
            }
            ss = sorted({a for a, _ in edges})
            w = {s: None for s in ss}
            for _ in range(10):
                new = {}
                for s in ss:
                    outs = []
                    for (a, b), p in edges.items():
                        if a != s:
                            continue
                        val = (
                            1_000_000
                            if b == "CONV"
                            else (w[b] if b in w else None)
                        )
                        if val is not None:
                            outs.append(p * val)
                    new[s] = (
                        (sum(outs) + 500_000) // 1_000_000 if outs else None
                    )
                w = new
            return w.get("START")

        full = pconv("none")
        per = {}
        for ch in ["view", "click", "signup", "error"]:
            p = pconv(ch)
            if p is not None:
                per[ch] = (full, p, full - p)
        td = sum(d for _, _, d in per.values())
        expect = {
            ch: (
                f,
                p,
                _ratio6(d, max(f, 1)),
                _ratio6(d, max(td, 1)),
            )
            for ch, (f, p, d) in per.items()
        }

        assert "view" not in got  # severed-START scenario row vanishes
        assert "error" in got and got["error"][2] == pytest.approx(0.0)
        assert got == expect
