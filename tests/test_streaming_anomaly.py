"""Streaming anomaly alerts: a cell far off its seasonal baseline emits
exactly one alert; normal cells stay silent; replays don't duplicate."""

from __future__ import annotations

import json

from etl_pipeline_spark.streaming.anomaly import (
    read_alerts,
    seasonal_baseline,
    start_anomaly_alerts,
)


def _event(eid, ts, etype):
    return json.dumps(
        {"event_id": eid, "ts": ts, "user_id": eid % 7, "event_type": etype, "value": 1.0}
    )


def test_anomaly_alerts_fire_only_off_baseline(spark, tmp_path):
    # history: 2 days, 5 clicks at hour 10 each day -> expected 5/day
    hist_rows = []
    eid = 0
    for day in (1, 2):
        for i in range(5):
            hist_rows.append((eid, f"2024-01-0{day} 10:{i:02d}:00", "click"))
            eid += 1
    hist = spark.createDataFrame(
        [(e, ts, t) for e, ts, t in hist_rows], "event_id long, ts string, event_type string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    base = seasonal_baseline(hist)
    assert {(r.event_type, r.hour_of_day, r.expected_per_day) for r in base.collect()} == {
        ("click", 10, 5.0)
    }

    # live batch: hour 10 sees 30 clicks (anomalous); hour 11 sees 3 (new
    # cell, |z| = (3-0)/1 = 3 -> also alerts as an unseen-pattern cell)
    inp = tmp_path / "in"
    inp.mkdir()
    lines = [_event(100 + i, f"2024-01-03 10:00:{i:02d}", "click") for i in range(30)]
    lines += [_event(200 + i, f"2024-01-03 11:00:{i:02d}", "click") for i in range(2)]
    (inp / "live.jsonl").write_text("\n".join(lines) + "\n")

    alert_dir = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    q = start_anomaly_alerts(spark, str(inp), base, alert_dir, ckpt)
    q.awaitTermination(120)

    alerts = {(r.event_type, r.hour_of_day): r for r in read_alerts(spark, alert_dir).collect()}
    # hour 10: z = (30 - 5)/sqrt(5) ~ 11.2 -> alert
    assert ("click", 10) in alerts
    assert alerts[("click", 10)].n_observed == 30
    # hour 11: 2 observed vs 0 expected -> z = 2 < 3 -> NO alert
    assert ("click", 11) not in alerts

    # restart with no new files: no new alert batches, no duplicates
    q2 = start_anomaly_alerts(spark, str(inp), base, alert_dir, ckpt)
    q2.awaitTermination(120)
    again = read_alerts(spark, alert_dir).collect()
    assert len(again) == len(alerts)


def test_anomaly_multiday_backlog_does_not_stack_days(spark, tmp_path):
    """r9 review find: an availableNow backlog spanning 3 days used to
    merge every day's hour-10 into one cell (3x expected -> false
    alarm). Each (event_date, hour) slot must score separately: three
    healthy days of exactly-expected volume produce ZERO alerts."""
    hist_rows = []
    eid = 0
    for day in (1, 2):
        for i in range(12):
            hist_rows.append((eid, f"2024-01-0{day} 10:{i:02d}:00", "click"))
            eid += 1
    hist = spark.createDataFrame(
        hist_rows, "event_id long, ts string, event_type string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    base = seasonal_baseline(hist)  # click@10 -> 12/day

    inp = tmp_path / "in"
    inp.mkdir()
    lines = []
    for day in (3, 4, 5):  # three healthy days, exactly expected volume
        lines += [
            _event(1000 * day + i, f"2024-01-0{day} 10:{i:02d}:00", "click")
            for i in range(12)
        ]
    (inp / "live.jsonl").write_text("\n".join(lines) + "\n")
    q = start_anomaly_alerts(
        spark, str(inp), base, str(tmp_path / "alerts"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    click_alerts = [
        r
        for r in read_alerts(spark, str(tmp_path / "alerts")).collect()
        if r.event_type == "click" and r.hour_of_day == 10
    ]
    assert click_alerts == []  # 12 observed vs 12 expected per slot


def test_anomaly_total_outage_alerts(spark, tmp_path):
    """r9 review find: a producer that dies entirely used to vanish
    from the observed-side join and never alert. A batch whose touched
    slots include an hour where a high-volume type sent NOTHING must
    emit a z = -expected/sqrt(expected) volume-drop alert."""
    hist_rows = []
    eid = 0
    for day in (1, 2):
        for i in range(25):
            hist_rows.append((eid, f"2024-01-0{day} 10:{i:02d}:00", "click"))
            eid += 1
    hist = spark.createDataFrame(
        hist_rows, "event_id long, ts string, event_type string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    base = seasonal_baseline(hist)  # click@10 -> 25/day

    inp = tmp_path / "in"
    inp.mkdir()
    # the click producer is DEAD; only view events arrive, spanning hour 10
    lines = [_event(500 + i, f"2024-01-03 10:{i:02d}:00", "view") for i in range(5)]
    (inp / "live.jsonl").write_text("\n".join(lines) + "\n")
    q = start_anomaly_alerts(
        spark, str(inp), base, str(tmp_path / "alerts"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    alerts = {
        (r.event_type, r.hour_of_day): r
        for r in read_alerts(spark, str(tmp_path / "alerts")).collect()
    }
    assert ("click", 10) in alerts  # z = (0-25)/5 = -5
    assert alerts[("click", 10)].n_observed == 0
    assert alerts[("click", 10)].z_poisson == -5.0
