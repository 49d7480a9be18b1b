"""Regenerate OPERATORS.md from __ray_entry__.py (static parse, no Ray).

Run: python tools/gen_operators.py
"""
import ast
import re

src = open("__ray_entry__.py").read()
tree = ast.parse(src)
_ofun = None
for _n in ast.walk(tree):
    if isinstance(_n, ast.FunctionDef) and _n.name == "oracle_sql":
        _ofun = _n
oracle_keys = set()
for _n in ast.walk(_ofun):
    if isinstance(_n, ast.Dict):
        oracle_keys |= {
            k.value for k in _n.keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)
        }
qfun = next(
    n for n in ast.walk(tree)
    if isinstance(n, ast.FunctionDef) and n.name == "queries"
)
defs = {}
for node in qfun.body:
    if isinstance(node, ast.FunctionDef):
        body = ast.get_source_segment(src, node)
        ops = set(re.findall(
            r"\b(?:relational|dedup|geo_ops|multimodal|simsearch|text|sketch"
            r"|tile|ingest|join|history|codec)\.(\w+)", body))
        for _m, f in re.findall(r"from engine\.(\S+) import (\w+)", body):
            ops.add(f.split(" as ")[0])
        defs[node.name] = sorted(ops)
ret = re.search(r"return \{(.*?)\n    \}\n", src, re.S).group(1)
names = re.findall(r'"([a-z0-9_]+)": (\w+)', ret)
lines = [
    "# OPERATORS — query inventory (generated: python tools/gen_operators.py)",
    "",
    "One row per `queries()` entry. Oracle: SQL = DuckDB twin in",
    "`oracle_sql()` (driver value-hash check); pytest = brute-force /",
    "planted-fixture self-oracle in `tests/`; both gates run at every",
    "round. Ops column lists the engine functions the query composes.",
    "",
    "| query | oracle | engine ops used |",
    "|---|---|---|",
]
n_sql = 0
for qname, fname in names:
    o = "SQL" if qname in oracle_keys else "pytest"
    n_sql += o == "SQL"
    ops = ", ".join(f"`{x}`" for x in defs.get(fname, [])) or "—"
    lines.append(f"| `{qname}` | {o} | {ops} |")
lines += ["", f"Totals: {len(names)} queries, {n_sql} SQL-oracled, "
          f"{len(names) - n_sql} pytest/self-oracled."]
lines += ["", "## Twin-coverage notes", """
- `image_resize`, `image_augment`, `image_features`,
  `image_sharpness`, and the other pixel-regenerating image twins
  cover the **lossless raw16 subset only** (1048 of 1500 fixture
  rows): DuckDB can regenerate raw16 pixels bit-exactly from the id,
  but not the qdct-coded rows, which would need the from-scratch DCT
  codec inside SQL. Full-corpus byte exactness for BOTH codecs stays
  pytest-oracled (PSNR gate + byte-identical re-encode tests) — do
  not read the SQL twin as full-codec coverage.
- `embedding_pca_components` is pytest-oracled (a d x d eigensolve is
  not SQL-expressible); its distributed half — the (count, sum, Gram)
  moment partials — is hash-checked exactly by the SQL-twinned
  companion `embedding_cov_moments` (trace identities tr(C^p),
  p = 1..4).
- `docs_bpe_merges` is pytest-oracled (iterative argmax training);
  both the driver-vocab and the sharded big path are covered by the
  same reference-implementation oracle plus a forced-gate parity
  test."""]
open("OPERATORS.md", "w").write("\n".join(lines) + "\n")
print(f"{len(names)} queries, {n_sql} SQL-oracled")
