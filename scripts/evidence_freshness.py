"""Evidence-freshness audit — round-8 verdict item 6.

Every registry query's correctness evidence is a driver row in some
CORRECTNESS_r{N}.json, checked against the tree as of the end of round N
(the PARENT of that round's "round N: verdict/advice/correctness/bench"
snapshot commit). A row goes STALE when, since that tree, any code the
query executes changed:

  symbols — a static cross-module slice: starting from the q_* function
            in plans/registry.py, every top-level function / class /
            constant it transitively references, followed through
            package-internal imports and `module.attr` accesses at
            SYMBOL granularity (so an additive helper landing in a
            shared module does not mark every consumer stale);
  modules — wholesale file hash only where symbol tracking is unsafe
            (a bare module object passed around, a missing symbol, a
            module with loose top-level statements beyond imports/defs);
  oracle  — the DuckDB oracle SQL string (md5 of oracle_sql()[name];
            for old trees computed once per commit in a detached
            temporary git worktree subprocess, cached under /tmp).

Every slice is additionally seeded with the shared wrapper prologue the
driver executes around every query — _fresh, session.free_caches, and
the queries() assembly body (ADVICE r8; see PROLOGUE_SEEDS /
PROLOGUE_EQUIV) — so a semantic change to that prologue marks every
query stale, not none.

Nothing from old trees is ever imported — old registry/operator slices
are pure-static ast extraction over `git show` blobs; only oracle_sql()
(programmatic string assembly) runs in a subprocess, pinned to its own
worktree.

Usage:
  python scripts/evidence_freshness.py            # full audit table
  python scripts/evidence_freshness.py --stale    # stale queries only
  python scripts/evidence_freshness.py --window   # suggested 50-slot
         _DRIVER_WINDOW for the next round: stale first, then oldest
         evidence, alphabetical within a cohort

The --window output makes the per-round staging decision mechanical:
"no registry query's latest green row predates the last semantic change
to code it executes" is exactly `--stale` printing nothing after the
window's round completes.
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "cdc_poc_spark"
REGISTRY_MOD = f"{PKG}.plans.registry"
CACHE_DIR = "/tmp/cdc_poc_evidence_cache"
WINDOW_SIZE = 50

# Shared wrapper prologue every driver-executed query runs (ADVICE r8):
# the driver calls queries()[name], which is _fresh(q_*) — so _fresh,
# session.free_caches, and the queries() assembly are code EVERY query
# executes, yet a q_*-rooted slice never reaches them. Seed them into
# every slice. `queries` is hashed BODY-ONLY (non-transitive): its data
# dependencies (_DRIVER_WINDOW, _RAW_QUERIES) are ordering-only and churn
# by design every round's window rotation — walking them would mark the
# whole registry stale on every rotation. A semantic change to the
# assembly itself still shows (the body text changes), and _fresh's walk
# covers the wrapper that actually executes per call.
PROLOGUE_SEEDS = [
    (REGISTRY_MOD, "_fresh", True),  # transitive: pulls free_caches
    (f"{PKG}.session", "free_caches", True),
    (REGISTRY_MOD, "queries", False),  # body-only, see above
]

# Hand-reviewed equivalence classes for prologue artifacts: hash pairs
# adjudicated as semantically identical PER EXECUTED QUERY, so a
# historical no-risk refactor doesn't backdate staleness onto every row
# checked before it. Sole entry: the round-7 queries() change (r6 tree
# 5af48d58... -> r7 tree 6873cdc8...) added _DRIVER_WINDOW-first dict
# ORDERING — both sides return `_fresh(fn)` per query, and dict order
# cannot change any query's result (diff reviewed round 9; reproduce with
# `git show <r6^>:cdc_poc_spark/plans/registry.py`). Future prologue
# changes get NO waiver unless reviewed and added here with the same
# written justification.
PROLOGUE_EQUIV: dict[str, list[frozenset[str]]] = {
    f"prologue:{REGISTRY_MOD}:queries": [
        frozenset(
            {
                "5af48d581e8d043c3361c67194ba45c1",
                "6873cdc86145d8170f60dea134d357d3",
            }
        )
    ]
}


def slice_diff(cur_slice: dict[str, str], old_slice: dict[str, str]) -> list[str]:
    """Artifact keys that differ between two slices, minus hand-reviewed
    prologue equivalences (see PROLOGUE_EQUIV)."""
    out = []
    for k in sorted(set(cur_slice) | set(old_slice)):
        a, b = cur_slice.get(k), old_slice.get(k)
        if a == b:
            continue
        if a is not None and b is not None and any(
            {a, b} <= cls for cls in PROLOGUE_EQUIV.get(k, [])
        ):
            continue
        out.append(k)
    return out


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


# ---------------------------------------------------------------- ledger


def ledger() -> dict[str, int]:
    """query -> latest round with an all-green driver row."""
    latest: dict[str, int] = {}
    for fn in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(REPO, fn)) as f:
            rows = json.load(f)
        for name, r in rows.items():
            green = (
                r.get("err") is None
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match") in (True, None)
            )
            if green and rnd > latest.get(name, -1):
                latest[name] = rnd
    return latest


def evidence_commits() -> dict[int, str]:
    """round -> the tree its driver check ran against (parent of the
    round's snapshot commit)."""
    out: dict[int, str] = {}
    for line in _git("log", "--format=%H %s").splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m:
            out[int(m.group(2))] = f"{m.group(1)}^"
    return out


# ----------------------------------------------------------- tree access


def _tree_files(ref: str | None) -> set[str]:
    if ref is None:
        out = subprocess.run(
            ["git", "ls-files", PKG], cwd=REPO, check=True,
            capture_output=True, text=True,
        ).stdout
    else:
        out = _git("ls-tree", "-r", "--name-only", ref, PKG)
    return set(out.splitlines())


def _read(ref: str | None, path: str) -> str | None:
    if ref is None:
        p = os.path.join(REPO, path)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read()
    try:
        return _git("show", f"{ref}:{path}")
    except subprocess.CalledProcessError:
        return None


def _mod_to_path(mod: str, files: set[str]) -> str | None:
    p = mod.replace(".", "/") + ".py"
    if p in files:
        return p
    p = mod.replace(".", "/") + "/__init__.py"
    return p if p in files else None


def _resolve_from(module: str | None, level: int, current: str) -> str:
    """Resolve a (possibly relative) `from X import ...` against the
    current module's dotted path."""
    if level == 0:
        return module or ""
    parts = current.split(".")[:-level]
    if module:
        parts.append(module)
    return ".".join(parts)


# --------------------------------------------------- per-module indexing


class ModuleIndex:
    """Static index of one module: top-level defs by name, import alias
    maps (package-internal only), and loose top-level statements."""

    def __init__(self, modname: str, text: str, files: set[str]):
        self.modname = modname
        self.text = text
        self.defs: dict[str, ast.AST] = {}
        self.mod_alias: dict[str, str] = {}  # local name -> module path
        self.name_src: dict[str, tuple[str, str]] = {}  # name -> (mod, orig)
        self.loose: list[str] = []  # non-def non-import top-level source
        self.raw_queries: dict[str, str] = {}
        tree = ast.parse(text)
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                self.defs[node.name] = node
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = (
                    node.targets if isinstance(node, ast.Assign) else [node.target]
                )
                named = [t for t in targets if isinstance(t, ast.Name)]
                for t in named:
                    self.defs[t.id] = node
                    if t.id == "_RAW_QUERIES" and isinstance(node.value, ast.Dict):
                        for k, v in zip(node.value.keys, node.value.values):
                            if isinstance(k, ast.Constant) and isinstance(
                                v, ast.Name
                            ):
                                self.raw_queries[k.value] = v.id
                if not named:  # tuple-unpack etc. — keep it in the loose set
                    self.loose.append(ast.get_source_segment(text, node) or "")
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                self._index_import(node, files)
            elif isinstance(node, ast.Expr) and isinstance(
                node.value, ast.Constant
            ):
                pass  # docstring
            elif isinstance(node, ast.If) and isinstance(
                node.test, ast.Compare
            ) and "__main__" in ast.dump(node.test):
                pass  # if __name__ == "__main__" block: not library code
            else:
                self.loose.append(ast.get_source_segment(text, node) or "")

    def _index_import(self, node: ast.AST, files: set[str]) -> None:
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    self.mod_alias[a.asname or a.name.split(".")[0]] = a.name
        elif isinstance(node, ast.ImportFrom):
            base = _resolve_from(node.module, node.level, self.modname)
            if not base.startswith(PKG):
                return
            for a in node.names:
                sub = f"{base}.{a.name}"
                if _mod_to_path(sub, files):
                    self.mod_alias[a.asname or a.name] = sub
                else:
                    self.name_src[a.asname or a.name] = (base, a.name)


class TreeView:
    """Lazy ModuleIndex / file-hash access for one git tree (None = wt)."""

    def __init__(self, ref: str | None):
        self.ref = ref
        self.files = _tree_files(ref)
        self._idx: dict[str, ModuleIndex | None] = {}

    def index(self, mod: str) -> ModuleIndex | None:
        if mod not in self._idx:
            path = _mod_to_path(mod, self.files)
            text = _read(self.ref, path) if path else None
            try:
                self._idx[mod] = (
                    ModuleIndex(mod, text, self.files) if text is not None else None
                )
            except SyntaxError:
                self._idx[mod] = None
        return self._idx[mod]

    def file_hash(self, mod: str) -> str | None:
        path = _mod_to_path(mod, self.files)
        text = _read(self.ref, path) if path else None
        return None if text is None else hashlib.md5(text.encode()).hexdigest()


# -------------------------------------------------- symbol-level slicing


def _walk_symbol(
    idx: ModuleIndex,
    node: ast.AST,
    push,
    mark_module,
    local_alias: dict[str, str],
    local_names: dict[str, tuple[str, str]],
    files: set[str],
) -> None:
    """Collect references out of one def's body: symbols in the same
    module, `alias.attr` cross-module symbols, whole-module marks for
    bare module-object uses, and function-local package imports."""
    skip_names: set[int] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Attribute) and isinstance(sub.value, ast.Name):
            base = sub.value.id
            mod = local_alias.get(base) or idx.mod_alias.get(base)
            if mod:
                push(mod, sub.attr)
                skip_names.add(id(sub.value))
        elif isinstance(sub, (ast.Import, ast.ImportFrom)):
            # function-local imports: extend the alias maps for THIS walk
            if isinstance(sub, ast.Import):
                for a in sub.names:
                    if a.name.startswith(PKG):
                        local_alias[a.asname or a.name.split(".")[0]] = a.name
            else:
                base = _resolve_from(sub.module, sub.level, idx.modname)
                if base.startswith(PKG):
                    for a in sub.names:
                        subm = f"{base}.{a.name}"
                        # resolve against the walker's file set lazily via
                        # push: try submodule first, else (base, name)
                        local_names[a.asname or a.name] = (base, a.name)
                        local_alias.setdefault(a.asname or a.name, subm)
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name) and id(sub) not in skip_names:
            n = sub.id
            if n in idx.defs:
                push(idx.modname, n)
            elif n in local_names:
                # the locally-imported name may actually be a SUBMODULE
                # used as a bare object — resolve against the tree's file
                # set: a real submodule must be hashed WHOLESALE (symbol
                # tracking can't follow a module object), while a plain
                # imported name stays a symbol push
                sub = local_alias.get(n)
                if sub and _mod_to_path(sub, files):
                    mark_module(sub)
                else:
                    push(*local_names[n])
            elif n in idx.name_src:
                push(*idx.name_src[n])
            elif n in local_alias:
                mark_module(local_alias[n])
            elif n in idx.mod_alias:
                # bare module object escapes symbol tracking — be safe
                mark_module(idx.mod_alias[n])


def query_slice(view: TreeView, qname: str) -> dict[str, str] | None:
    """{artifact_key: md5} for one query on one tree, or None if the query
    is absent. Keys: 'sym:<module>:<name>' and 'mod:<module>' (wholesale)."""
    reg = view.index(REGISTRY_MOD)
    if reg is None:
        return None
    fn_name = reg.raw_queries.get(qname)
    if fn_name is None:
        return None
    out: dict[str, str] = {}
    seen: set[tuple[str, str]] = set()
    whole: set[str] = set()
    work: list[tuple[str, str]] = [(REGISTRY_MOD, fn_name)]
    for mod, name, transitive in PROLOGUE_SEEDS:
        if transitive:
            work.append((mod, name))
        else:
            idx = view.index(mod)
            node = idx.defs.get(name) if idx else None
            seg = (ast.get_source_segment(idx.text, node) or "") if node else ""
            out[f"prologue:{mod}:{name}"] = (
                hashlib.md5(seg.encode()).hexdigest() if seg else "ABSENT"
            )

    def push(mod: str, name: str) -> None:
        if (mod, name) not in seen:
            work.append((mod, name))

    def mark_module(mod: str) -> None:
        # `from ..x import y` where y is a submodule arrives as a symbol
        # push of (parent, y); normalize module marks here
        whole.add(mod)

    while work:
        mod, name = work.pop()
        if (mod, name) in seen:
            continue
        seen.add((mod, name))
        idx = view.index(mod)
        if idx is None:
            # maybe `mod` is really parent.symbol (submodule-vs-name
            # ambiguity from local imports): try the parent as a module
            whole.add(mod)
            continue
        if name not in idx.defs:
            if name in idx.name_src:  # re-export chase
                push(*idx.name_src[name])
            elif name in idx.mod_alias:  # imported submodule accessed
                whole.add(idx.mod_alias[name])
            else:  # dynamic / missing: wholesale
                whole.add(mod)
            continue
        node = idx.defs[name]
        seg = ast.get_source_segment(idx.text, node) or ""
        out[f"sym:{mod}:{name}"] = hashlib.md5(seg.encode()).hexdigest()
        if idx.loose:
            loose = "\n".join(idx.loose)
            out[f"loose:{mod}"] = hashlib.md5(loose.encode()).hexdigest()
        _walk_symbol(idx, node, push, mark_module, {}, {}, view.files)
    for mod in sorted(whole):
        h = view.file_hash(mod)
        out[f"mod:{mod}"] = h if h is not None else "ABSENT"
    return out


# ----------------------------------------------------------- oracle hashes


def oracle_hashes(ref: str | None) -> dict[str, str]:
    """query -> md5 of its oracle SQL at a tree. Current tree: subprocess
    on the worktree; old tree: detached temp git worktree, cached."""
    prog = (
        "import sys, json, hashlib; sys.path.insert(0, '.');"
        "from cdc_poc_spark.plans import oracles;"
        "print(json.dumps({k: hashlib.md5(v.encode()).hexdigest()"
        " for k, v in oracles.oracle_sql().items()}))"
    )
    if ref is None:
        out = subprocess.run(
            [sys.executable, "-c", prog], cwd=REPO, check=True,
            capture_output=True, text=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])
    commit = _git("rev-parse", ref).strip()
    os.makedirs(CACHE_DIR, exist_ok=True)
    cache = os.path.join(CACHE_DIR, f"{commit}.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    wt = os.path.join(CACHE_DIR, f"wt_{commit[:12]}")
    # a crashed prior run can leave the worktree behind (its cache file
    # was never written), and `git worktree add` refuses an existing
    # path — clean up best-effort before adding
    if os.path.exists(wt):
        try:
            _git("worktree", "remove", "--force", wt)
        except subprocess.CalledProcessError:
            import shutil

            shutil.rmtree(wt, ignore_errors=True)
            _git("worktree", "prune")
    _git("worktree", "add", "--detach", wt, commit)
    try:
        out = subprocess.run(
            [sys.executable, "-c", prog], cwd=wt, check=True,
            capture_output=True, text=True,
        ).stdout
        hashes = json.loads(out.strip().splitlines()[-1])
    finally:
        _git("worktree", "remove", "--force", wt)
    with open(cache, "w") as f:
        json.dump(hashes, f)
    return hashes


# ------------------------------------------------------------------ audit


def audit() -> list[dict]:
    latest = ledger()
    commits = evidence_commits()
    cur = TreeView(None)
    cur_oracles = oracle_hashes(None)
    old_views: dict[str, TreeView] = {}
    old_oracles: dict[str, dict[str, str]] = {}
    reg = cur.index(REGISTRY_MOD)
    assert reg is not None
    rows = []
    for qname in sorted(reg.raw_queries):
        cur_slice = query_slice(cur, qname)
        assert cur_slice is not None
        rnd = latest.get(qname)
        reasons: list[str] = []
        if rnd is None:
            reasons.append("never-checked")
        elif rnd not in commits:
            reasons.append(f"no-snapshot-r{rnd}")
        else:
            ref = commits[rnd]
            if ref not in old_views:
                old_views[ref] = TreeView(ref)
                old_oracles[ref] = oracle_hashes(ref)
            old_slice = query_slice(old_views[ref], qname)
            if old_slice is None:
                reasons.append("added-since")
            else:
                reasons.extend(slice_diff(cur_slice, old_slice))
            if old_oracles[ref].get(qname) != cur_oracles.get(qname):
                reasons.append("oracle-changed")
        rows.append({"query": qname, "evidence_round": rnd, "stale": reasons})
    return rows


def suggest_window(rows: list[dict]) -> list[str]:
    def key(r):
        return (
            0 if r["stale"] else 1,  # stale first
            r["evidence_round"] if r["evidence_round"] is not None else -1,
            r["query"],
        )

    return [r["query"] for r in sorted(rows, key=key)][:WINDOW_SIZE]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stale", action="store_true")
    ap.add_argument("--window", action="store_true")
    args = ap.parse_args()
    rows = audit()
    if args.window:
        for q in suggest_window(rows):
            print(q)
        return
    shown = [r for r in rows if r["stale"]] if args.stale else rows
    for r in shown:
        tag = "; ".join(r["stale"]) if r["stale"] else "fresh"
        print(f"{r['query']}\tr{r['evidence_round']}\t{tag}")
    n_stale = sum(1 for r in rows if r["stale"])
    print(
        f"# {len(rows)} queries, {n_stale} stale, {len(rows) - n_stale} fresh",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
