

def test_funnel_counts_strict_order(ray_session):
    import datetime as dt
    import ray.data as rd
    from ksoup_ray.functions.agg import funnel_counts

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, sec, typ):
        return {"user_id": u, "ts": t0 + dt.timedelta(seconds=sec),
                "event_type": typ}

    rows = [
        # u1 completes the full funnel in order
        ev(1, 0, "view"), ev(1, 10, "click"), ev(1, 20, "purchase"),
        # u2 purchases BEFORE clicking: stops at click
        ev(2, 0, "view"), ev(2, 5, "purchase"), ev(2, 10, "click"),
        # u3 clicks at the SAME ts as view: strict '>' excludes it
        ev(3, 0, "view"), ev(3, 0, "click"),
        # u4 never views: counts nowhere despite click+purchase
        ev(4, 0, "click"), ev(4, 1, "purchase"),
        # u5 completes with noise events interleaved
        ev(5, 0, "error"), ev(5, 1, "view"), ev(5, 2, "view"),
        ev(5, 3, "click"), ev(5, 4, "error"), ev(5, 5, "purchase"),
    ]
    out = funnel_counts(rd.from_items(rows).repartition(4),
                        steps=("view", "click", "purchase"),
                        num_partitions=3) \
        .to_pandas().set_index("step").sort_index()
    # view: u1,u2,u3,u5 = 4; click strictly after view: u1,u2,u5 = 3
    # (u3's click ties the view ts); purchase after click: u1,u5 = 2
    # (u2 purchased before clicking)
    assert list(out["users"]) == [4, 3, 2]
    assert list(out["event_type"]) == ["view", "click", "purchase"]
