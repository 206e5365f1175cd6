"""One-shot refactoring script (VERDICT r10 task 8): factor the 10.4k-line
__spark_entry__.py query/oracle registry into a `pipelinedp_spark.queries`
package without changing any query name, behavior, or oracle hash.

Mechanics: slice the file's top-level nodes by section line ranges into
family modules; split the central `_query_registry()` / `oracle_sql()`
dict literals so each entry lands in the module that defines its value's
root symbol (exported as module-level QUERIES / ORACLES dicts); keep the
driver contract (`entry` / `queries` / `oracle_sql` / rotation list) in
the entry file, merging the module dicts in the exact preserved order.

Run once, review the diff, run the full oracle compare. Kept in scripts/
as the audit trail of how the split was produced.
"""

import ast
import builtins
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY = os.path.join(REPO, "__spark_entry__.py")
PKG = os.path.join(REPO, "pipelinedp_spark", "queries")

# (module_name, start_line, end_line_exclusive, docstring) — boundaries
# are the file's own section separators.
SECTIONS = [
    ("dp_core", 74, 1736,
     "Correctness-gate DP queries (deterministic mode) + DuckDB oracles."),
    ("text_dedup", 2210, 2762,
     "LLM-pipeline operators: text analysis, dedup, similarity."),
    ("analysis", 2762, 4154,
     "Analysis layer: utility analysis + dataset histograms oracles."),
    ("corpus_ops", 4154, 5831,
     "Semantic dedup, span dedup, LM-quality, retrieval, importance "
     "weighting."),
    ("sketches", 5831, 7163,
     "Deterministic sketches: HyperLogLog, count-min, Bloom, KMV; "
     "packing, mixing, multimodal decode."),
    ("extended", 7163, 10363,
     "Round-7+ families: language ID, embeddings, events analytics, "
     "TPC-H, PII/release, upserts, BM25/ANN store lifecycles."),
]

HEADER = '''"""{doc}

Part of the driver-contract oracle registry (split out of
__spark_entry__.py in round 11; every query name, plan, and oracle hash
unchanged). QUERIES maps query name -> (spark, sf_dir) -> DataFrame;
ORACLES maps the same names to DuckDB-ANSI SQL strings the driver runs
side-by-side at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pipelinedp_spark as pds
from pipelinedp_spark import dp_computations as dpc
from pipelinedp_spark.queries.common import _t

'''


def main() -> None:
    src = open(ENTRY).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # ---- map every top-level symbol to its section ----
    def section_of(lineno: int):
        for name, s, e, _ in SECTIONS:
            if s <= lineno < e:
                return name
        return None

    sym_module = {}   # top-level symbol -> module name (or None=entry)
    node_spans = []   # (module, start, end) for slicing
    keep_entry = {"entry", "queries", "_query_registry", "oracle_sql",
                  "_DRIVER_ARTIFACT_FIRST"}
    for node in tree.body:
        names = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets
                     if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target,
                                                            ast.Name):
            names = [node.target.id]
        mod = section_of(node.lineno)
        if any(n in keep_entry for n in names):
            mod = None
        if names and names[0] in ("_t", "_T_CACHE"):
            mod = "common"
        for n in names:
            sym_module[n] = mod
        node_spans.append((mod, node, names))

    # ---- split the two registry dicts by value root symbol ----
    def dict_entries(fn_name: str):
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) and node.name == fn_name:
                ret = node.body[-1]
                assert isinstance(ret, ast.Return)
                d = ret.value
                assert isinstance(d, ast.Dict)
                out = []
                for k, v in zip(d.keys, d.values):
                    key = ast.literal_eval(k)
                    vsrc = ast.get_source_segment(src, v)
                    root = next((n.id for n in ast.walk(v)
                                 if isinstance(n, ast.Name)), None)
                    out.append((key, vsrc, root))
                return out
        raise AssertionError(fn_name)

    q_entries = dict_entries("_query_registry")
    o_entries = dict_entries("oracle_sql")
    order = [k for k, _, _ in q_entries]

    def owner(root):
        return sym_module.get(root)

    # ---- build module sources ----
    mod_src = {name: HEADER.format(doc=doc)
               for name, _, _, doc in SECTIONS}
    for mod, node, _names in node_spans:
        if mod in (None, "common"):
            continue
        chunk = "".join(lines[node.lineno - 1:node.end_lineno])
        mod_src[mod] += "\n" + chunk

    for name, _, _, _ in SECTIONS:
        qs = [(k, v) for k, v, r in q_entries if owner(r) == name]
        os_ = [(k, v) for k, v, r in o_entries if owner(r) == name]
        body = "\n\nQUERIES = {\n"
        for k, v in qs:
            body += f'    "{k}": {v},\n'
        body += "}\n\nORACLES = {\n"
        for k, v in os_:
            body += f'    "{k}": {v},\n'
        body += "}\n"
        mod_src[name] += body

    os.makedirs(PKG, exist_ok=True)
    for name, _, _, _ in SECTIONS:
        open(os.path.join(PKG, name + ".py"), "w").write(mod_src[name])

    # common.py: _t + cache
    t_span = None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "_t":
            t_span = (node.lineno, node.end_lineno)
        if isinstance(node, ast.AnnAssign) and \
                isinstance(node.target, ast.Name) and \
                node.target.id == "_T_CACHE":
            c_span = (node.lineno, node.end_lineno)
    common = ('"""Shared helpers for the oracle-registry query '
              'modules."""\n\nfrom __future__ import annotations\n\n'
              'from pyspark.sql import DataFrame, SparkSession\n'
              'from pyspark.sql import functions as F\n\n')
    common += "".join(lines[c_span[0] - 1:c_span[1]]) + "\n\n"
    common += "".join(lines[t_span[0] - 1:t_span[1]])
    open(os.path.join(PKG, "common.py"), "w").write(common)
    open(os.path.join(PKG, "__init__.py"), "w").write(
        '"""Oracle-registry query families (driver contract lives in '
        '__spark_entry__.py)."""\n')

    # ---- new entry file ----
    front_span = None
    for node in tree.body:
        if isinstance(node, ast.Assign) and \
                isinstance(node.targets[0], ast.Name) and \
                node.targets[0].id == "_DRIVER_ARTIFACT_FIRST":
            front_span = (node.lineno, node.end_lineno)
    front_src = "".join(lines[front_span[0] - 1:front_span[1]])
    entry_fn = None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "entry":
            entry_fn = "".join(lines[node.lineno - 1:node.end_lineno])
    head = "".join(lines[:c_span[0] - 1])   # docstring + imports only
    mods = ", ".join(n for n, _, _, _ in SECTIONS)
    new = head + "\n"
    new += ("from pipelinedp_spark.queries import (" + mods + ")\n"
            "from pipelinedp_spark.queries.common import _t\n\n\n")
    new += entry_fn + "\n\n"
    new += front_src + "\n\n"
    new += '''_REGISTRY_ORDER = [\n'''
    for k in order:
        new += f'    "{k}",\n'
    new += "]\n\n\n"
    new += '''def _merged(attr: str) -> dict:
    out: dict = {}
    for m in (''' + mods + '''):
        out.update(getattr(m, attr))
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver contract: query name -> (spark, sf_dir) -> DataFrame.
    Merged from the pipelinedp_spark.queries family modules in the
    registry's historical order; _DRIVER_ARTIFACT_FIRST rotates the
    stalest names into the driver's 50-row artifact window."""
    reg = _merged("QUERIES")
    reg = {n: reg[n] for n in _REGISTRY_ORDER if n in reg}
    front = [n for n in _DRIVER_ARTIFACT_FIRST if n in reg]
    rest = [n for n in reg if n not in set(front)]
    return {n: reg[n] for n in (*front, *rest)}


def oracle_sql() -> dict[str, str]:
    """Driver contract: query name -> DuckDB oracle SQL (same column
    aliases as the Spark result; driver compares value hashes)."""
    sqls = _merged("ORACLES")
    return {n: sqls[n] for n in _REGISTRY_ORDER if n in sqls}
'''
    open(ENTRY, "w").write(new)
    print("entry lines:", new.count("\n") + 1)
    for name, _, _, _ in SECTIONS:
        print(name, mod_src[name].count("\n") + 1)
    print("q entries:", len(q_entries), "o entries:", len(o_entries))
    unassigned_q = [(k, r) for k, _, r in q_entries
                    if owner(r) not in {s[0] for s in SECTIONS}]
    print("unassigned:", unassigned_q)


if __name__ == "__main__":
    main()
