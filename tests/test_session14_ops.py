"""Edge-case unit tests for the session-14 operators (the oracle gate
covers corpus-scale parity; these pin the corner semantics)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(d: str, table: str, rows: dict):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table(rows), os.path.join(d, f"{table}.parquet"))


def test_ship_lag_signed_days_and_type1_quantiles():
    from mmgraphrag_ray.pipelines.relational import orders_ship_lag

    d = "/tmp/raykg_s14_lag"
    base = pd.Timestamp("2024-01-10")
    # priority A lags: [-2, 1, 5] -> p50 = sorted[ceil(.5*3)-1] = 1,
    #                                p90 = sorted[ceil(.9*3)-1] = 5
    # priority B lags: [7] -> p50 = p90 = 7
    _write(d, "orders", {
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([base] * 4, pa.timestamp("us")),
        "o_orderpriority": pa.array(["A", "A", "A", "B"], pa.string()),
    })
    _write(d, "lineitem", {
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_shipdate": pa.array(
            [base + pd.Timedelta(days=k) for k in (-2, 1, 5, 7)],
            pa.timestamp("us")),
    })
    out = orders_ship_lag(d).to_pandas().set_index("o_orderpriority")
    assert out.loc["A", "p50"] == 1 and out.loc["A", "p90"] == 5
    assert out.loc["A", "n_rows"] == 3
    assert out.loc["B", "p50"] == 7 and out.loc["B", "p90"] == 7


def test_sessions_in_spikes_inclusive_day_overlap():
    from mmgraphrag_ray.pipelines.relational import events_sessions_in_spikes

    d = "/tmp/raykg_s14_spk"
    # type 'x' over 3 days: counts 4/1/1 (avg 2) -> day1 spikes at 21/20;
    # type 'y' uniform -> never spikes
    t = pd.Timestamp("2024-03-01 10:00:00")
    day2, day3 = t + pd.Timedelta(days=1), t + pd.Timedelta(days=2)
    ts = (
        # user 1: one session spanning day1 only (4 'x' events, the spike)
        [t, t + pd.Timedelta(minutes=5), t + pd.Timedelta(minutes=10),
         t + pd.Timedelta(minutes=15)]
        # user 2: one session on day2 only (no spike) -> filtered out
        + [day2, day2 + pd.Timedelta(minutes=1)]
        # user 3: one event exactly at day3 midnight-10:00; session
        # [day3 10:00, day3 10:00] does NOT include day1 -> filtered
        + [day3]
    )
    _write(d, "events", {
        "event_id": pa.array(range(len(ts)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["x", "x", "x", "x", "y", "x", "x"],
                               pa.string()),
    })
    out = events_sessions_in_spikes(d).to_pandas()
    # only user 1's session overlaps the spike day
    assert set(out["user_id"]) == {1}
    row = out.iloc[0]
    assert row["n_events"] == 4 and row["n_spike_days"] == 1


def test_sessions_in_spikes_empty_keeps_schema():
    from mmgraphrag_ray.pipelines.relational import events_sessions_in_spikes

    d = "/tmp/raykg_s14_spk0"
    # perfectly uniform: 1 event/day/type -> no spikes -> empty WITH schema
    t = pd.Timestamp("2024-03-01")
    ts = [t + pd.Timedelta(days=k) for k in range(3)]
    _write(d, "events", {
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "event_type": pa.array(["x", "x", "x"], pa.string()),
    })
    ds = events_sessions_in_spikes(d)
    # Ray's to_pandas() drops columns on an all-empty dataset; the BLOCK
    # schema is what must survive (Arrow empty tables, not bare frames)
    assert ds.schema().names == ["user_id", "session_id", "n_events",
                                 "n_spike_days"]
    assert ds.count() == 0


def test_cdc_ivm_overlap_classes_hand_computed():
    from mmgraphrag_ray.pipelines.relational import orders_cdc_ivm

    d = "/tmp/raykg_s14_ivm"
    # keys chosen for every overlap class of the deterministic mutation:
    #   91 = 7*13  -> deleted (bump must NOT fire on a deleted key)
    #  143 = 11*13 -> deleted but re-inserted under +10M (net n: 0)
    #   14 = 7     -> survives with +100 bump
    #   11 = 11    -> survives AND re-inserted (counted twice)
    #    1         -> plain survivor
    _write(d, "orders", {
        "o_orderkey": pa.array([91, 143, 14, 11, 1], pa.int64()),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
        "o_orderstatus": pa.array(["O"] * 5, pa.string()),
    })
    out = orders_cdc_ivm(d).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    # applied table: 14 (300+100), 11 (400), 1 (500), 143+10M (200),
    # 11+10M (400)  -> n = 5, sum = 1900
    assert row["o_orderstatus"] == "O"
    assert row["n_orders"] == 5 and row["sum_cents"] == 1900


def test_autocorr_skips_missing_days_and_sums_exact():
    from mmgraphrag_ray.pipelines.relational import events_autocorr

    d = "/tmp/raykg_s14_ac"
    # type 'x' daily counts: day0=2, day1=3, day3=1 (day2 missing)
    # -> only pair (2, 3): n=1, sx=2, sy=3, sxx=4, syy=9, sxy=6
    t = pd.Timestamp("2024-05-01")
    ts = ([t, t + pd.Timedelta(hours=1)]
          + [t + pd.Timedelta(days=1, hours=h) for h in (0, 1, 2)]
          + [t + pd.Timedelta(days=3)])
    _write(d, "events", {
        "event_id": pa.array(range(len(ts)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * len(ts), pa.int64()),
        "event_type": pa.array(["x"] * len(ts), pa.string()),
    })
    out = events_autocorr(d).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row[["n", "sx", "sy", "sxx", "syy", "sxy"]].tolist() == \
        [1, 2, 3, 4, 9, 6]


def test_late_arrivals_hand_computed_reordering():
    import hashlib

    from mmgraphrag_ray.pipelines.relational import events_late_arrivals

    d = "/tmp/raykg_s14_late"
    # one user, 4 events 30 min apart; arrival = md5(event_id) order.
    # Recompute the expected late set with the same rule.
    t0 = pd.Timestamp("2024-06-01 00:00:00")
    ts = [t0 + pd.Timedelta(minutes=30 * i) for i in range(4)]
    _write(d, "events", {
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([7] * 4, pa.int64()),
        "event_type": pa.array(["x"] * 4, pa.string()),
    })
    order = sorted(range(4), key=lambda e: (
        hashlib.md5(str(e).encode()).hexdigest()[:8], e))
    wm = None
    expected_late = set()
    for e in order:
        if wm is not None and ts[e] < wm - pd.Timedelta(minutes=10):
            expected_late.add(e)
        wm = ts[e] if wm is None else max(wm, ts[e])
    out = events_late_arrivals(d).to_pandas()
    assert out["n_total"].sum() == 4
    assert out["n_late"].sum() == len(expected_late)
    # the permutation must actually produce lateness on some corpus —
    # guard against a vacuous identity ordering
    if order != sorted(order):
        assert len(expected_late) >= 1
