"""The lineage mirror (plans/lineage.py) must stay bound to running
code: every stage names a real callable, every non-column graph node
from grafo_sendas.html:586 is claimed by exactly one stage family, and
run_pipeline executes the stages in lineage order."""

from __future__ import annotations

import inspect

from etl_sendas_spark.plans import capital_sendas, lineage


def test_every_stage_func_exists():
    for st in lineage.STAGES:
        fn = getattr(capital_sendas, st.func, None)
        assert callable(fn), f"stage {st.name}: no callable {st.func}"


def test_no_unrealized_nodes():
    assert lineage.unrealized_nodes() == []


def test_node_counts_match_reference_graph():
    # grafo_sendas.html:586 — 6 gold, 5 lime, 8 red, 3 pink nodes
    assert len(lineage.TABLES) == 6
    assert len(lineage.CONDITIONS) == 5
    assert len(lineage.RULES) == 8
    assert len(lineage.CALCULATIONS) == 3


def test_run_pipeline_driven_by_stages():
    src = inspect.getsource(capital_sendas.run_pipeline)
    assert "STAGES" in src
    assert [s.name for s in lineage.STAGES] == [
        "ingest_filters",
        "parse_and_filter_month",
        "enrich",
        "apply_rules",
        "finalize",
    ]


def test_pipeline_lineage_shape():
    pl = lineage.pipeline_lineage()
    assert set(pl) == {"stages", "tables", "conditions", "rules", "calculations"}
    assert pl["stages"][-1].name == "finalize"
