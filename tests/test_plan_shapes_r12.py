"""Plan-shape pins for the round-12 TPC-H additions — the four classic
relational shapes that were still missing from the suite (Q4 EXISTS ->
left-semi, Q13 outer-join double-aggregate, Q17 decorrelated scalar
subquery, Q21 EXISTS+NOT-EXISTS -> per-order aggregate) plus the two
scan-only baselines (Q6, Q14). Each pin asserts the posture the query
docstring claims, so a regression that silently de-broadcasts a dim or
re-orders the Q13 aggregate behind the join fails here, not at 100 TB."""

import importlib.util
import re

from pipelinedp_spark import plans as P

SF = "/root/testdata/sf0.001"


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_mod_r12", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scan_ids_for_table(plan: str, table: str) -> list[str]:
    """Node ids of every `Scan parquet` whose detail-section Location
    names ``table`` (formatted explain puts locations in the details,
    not the tree)."""
    ids, cur = [], None
    for ln in plan.splitlines():
        m = re.match(r"^\((\d+)\) Scan parquet", ln.strip())
        if m:
            cur = m.group(1)
            continue
        if cur and "Location" in ln:
            if f"{table}.parquet" in ln:
                ids.append(cur)
            cur = None
    return ids


def test_tpch_q4_semi_join_no_fanout(spark):
    """Q4: the EXISTS must compile to a LEFT SEMI join (an order with a
    thousand late lines is one probe hit, never a thousand rows to
    re-dedup), the quarter bound must push into the orders scan, and
    the five-group count must partial-combine."""
    out = _entry().queries()["tpch_q4_priority_wait"](spark, SF)
    plan = P.explain_str(out)
    assert "LeftSemi" in plan
    assert re.search(r"PushedFilters:.*o_orderdate", plan)
    assert P.has_partial_aggregation(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_tpch_q6_scan_only_pushdown(spark):
    """Q6: the codegen baseline — all four predicates reach the parquet
    scan, there is no join anywhere, and the single-row sum partial-
    combines so the only exchange is the final 1-row combine."""
    out = _entry().queries()["tpch_q6_forecast_revenue"](spark, SF)
    plan = P.explain_str(out)
    assert re.search(r"PushedFilters:.*l_shipdate", plan)
    assert re.search(r"PushedFilters:.*l_discount", plan)
    assert re.search(r"PushedFilters:.*l_quantity", plan)
    assert "Join" not in plan
    assert P.has_partial_aggregation(out)


def test_tpch_q13_aggregates_before_outer_join(spark):
    """Q13: the qualifying orders must aggregate to one (custkey, cnt)
    row BEFORE the outer join — the join carries one row per customer,
    never one per order. Pinned by walking the orders scan's ancestor
    path: a HashAggregate must sit between the scan and its join. The
    priority exclusion must push into the orders scan."""
    out = _entry().queries()["tpch_q13_order_distribution"](spark, SF)
    plan = P.explain_str(out)
    assert re.search(r"PushedFilters:.*o_orderpriority", plan)
    # indentation walk: for the orders-side scan, the path up to the
    # join must pass through an aggregate (the per-custkey count)
    orders_ids = _scan_ids_for_table(plan, "orders")
    assert orders_ids, "orders scan not found in plan"
    tree_lines = plan.splitlines()
    orders_idxs = [i for i, ln in enumerate(tree_lines)
                   if any(f"Scan parquet  ({sid})" in ln
                          for sid in orders_ids)
                   and not ln.strip().startswith("(")]
    assert orders_idxs, "orders scan not found in plan tree"

    def indent(ln):
        return len(ln) - len(ln.lstrip(" :+-"))

    found_agg_before_join = False
    for idx in orders_idxs:
        cur = indent(tree_lines[idx])
        for i in range(idx - 1, -1, -1):
            ind = indent(tree_lines[i])
            if ind < cur:
                cur = ind
                name = tree_lines[i].strip(" :+-")
                if "Join" in name:
                    break
                if "HashAggregate" in name:
                    found_agg_before_join = True
    assert found_agg_before_join, \
        "orders reach the outer join un-aggregated (per-order fan-out)"
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_tpch_q14_broadcast_part_pushdown(spark):
    """Q14: part broadcasts (the month of fact rows never shuffles for
    a dim lookup), the month bound pushes into the lineitem scan, and
    the two conditional sums partial-combine."""
    out = _entry().queries()["tpch_q14_promo_revenue"](spark, SF)
    plan = P.explain_str(out)
    assert P.has_broadcast_join(out)
    assert re.search(r"PushedFilters:.*l_shipdate", plan)
    assert P.has_partial_aggregation(out)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_tpch_q17_broadcast_prune_before_stats(spark):
    """Q17: the brand's partkeys broadcast-prune the fact side BEFORE
    the per-part average aggregates (the stats build runs over ~4% of
    lineitem, not all of it): every lineitem scan must meet a
    BroadcastHashJoin below any HashAggregate, the brand predicate must
    push into the part scan, and no float average may appear — the
    filter is exact bigint (5 * qty * n < sum)."""
    out = _entry().queries()["tpch_q17_small_qty_revenue"](spark, SF)
    plan = P.explain_str(out)
    assert P.has_broadcast_join(out)
    assert re.search(r"PushedFilters:.*p_brand", plan)
    assert P.has_partial_aggregation(out)
    assert "avg(" not in plan, "per-part average must stay exact bigint"
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_tpch_q21_single_aggregate_no_self_join_blowup(spark):
    """Q21: the canonical EXISTS + NOT-EXISTS double self-join must NOT
    appear — the rewrite computes one per-order aggregate, so lineitem
    is scanned at most twice (once for the blamed R pairs, once for the
    per-order supplier stats) instead of four times, and supplier ⋈
    nation broadcasts into the blamed set."""
    out = _entry().queries()["tpch_q21_waiting_suppliers"](spark, SF)
    plan = P.explain_str(out)
    assert P.has_broadcast_join(out)
    assert P.has_partial_aggregation(out)
    n_lineitem_scans = len(_scan_ids_for_table(plan, "lineitem"))
    assert 1 <= n_lineitem_scans <= 2, \
        f"expected <=2 lineitem scans, plan has {n_lineitem_scans}"
    assert "TakeOrderedAndProject" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
