"""Model-based differential for the registry state machine.

An in-memory Python model implements the reference's trie semantics
verbatim (IndexedDocuments.kt add/remove, Node.kt promotion,
IndexedFileManager.kt demotion, DepthFirstSearch.kt listing/pruning);
hypothesis drives random op sequences through BOTH the model and the
DataFrame state machine and compares ANY + SOURCES_ONLY listings after
every op. This is the property-level evidence that registry.py matches
the reference beyond the fixed scenario gates.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from text_indexer_spark.operators import registry as R

SEGS = ["a", "b", "c"]


def _paths():
    return st.lists(st.sampled_from(SEGS), min_size=1, max_size=3).map("/".join)


class Model:
    """Reference-semantics model: files {(repo,path): nested}, dirs
    {(repo,path): status}."""

    def __init__(self):
        self.files: dict[tuple[str, str], bool] = {}
        self.dirs: dict[tuple[str, str], str] = {}

    @staticmethod
    def _ancestors(path, include_self=False):
        parts = path.split("/")
        hi = len(parts) if include_self else len(parts) - 1
        return ["/".join(parts[:i]) for i in range(1, hi + 1)]

    def _materialize_parents(self, repo, path):
        for anc in self._ancestors(path):
            k = (repo, anc)
            if k not in self.dirs and k not in self.files:
                self.dirs[k] = "not_indexed"

    def add_file(self, repo, path, doc_id):
        if (repo, path) in self.dirs:
            return  # path collision with a dir: skip (mirrors op input hygiene)
        self.files[(repo, path)] = False  # independent (promotes if existing)
        self._materialize_parents(repo, path)

    def add_dir(self, repo, path, swept):
        if (repo, path) in self.files:
            return
        # promote EXISTING not-indexed proper descendants (Node.kt:83-91)
        for (r, p), status in list(self.dirs.items()):
            if r == repo and p != path and status == "not_indexed":
                if path in self._ancestors(p):
                    self.dirs[(r, p)] = "nested"
        self.dirs[(repo, path)] = "independent"
        self._materialize_parents(repo, path)
        for (fr, fp, fid) in swept:
            if (fr, fp) in self.dirs:
                continue
            if (fr, fp) not in self.files:
                self.files[(fr, fp)] = True  # nested; never downgrade existing
            self._materialize_parents(fr, fp)

    def remove(self, files_rm, dirs_rm):
        # demotion set (IndexedFileManager.kt:36-58)
        mark = set()
        for (r, p, still) in files_rm:
            if still:
                for anc in self._ancestors(p):
                    mark.add((r, anc))
        for (r, p, contains) in dirs_rm:
            if contains:
                for anc in self._ancestors(p, include_self=True):
                    mark.add((r, anc))
        mark = {
            k for k in mark
            if k in self.dirs and self.dirs[k] != "not_indexed"
        }
        # drop files
        for (r, p, _s) in files_rm:
            self.files.pop((r, p), None)
        # drop subtrees of removed dirs (incl. the dirs)
        rm_keys = {(r, p) for (r, p, _c) in dirs_rm if (r, p) in self.dirs}
        def under_removed(r, p):
            return (r, p) in rm_keys or any(
                (r, anc) in rm_keys for anc in self._ancestors(p)
            )
        self.files = {k: v for k, v in self.files.items() if not under_removed(*k)}
        self.dirs = {k: v for k, v in self.dirs.items() if not under_removed(*k)}
        # demote
        for k in mark:
            if k in self.dirs:
                self.dirs[k] = "not_indexed"
        # prune: not_indexed dirs with no surviving file / indexed dir beneath
        keep_anchors = set()
        for (r, p) in self.files:
            for anc in self._ancestors(p):
                keep_anchors.add((r, anc))
        for (r, p), status in self.dirs.items():
            if status != "not_indexed":
                for anc in self._ancestors(p):
                    keep_anchors.add((r, anc))
        self.dirs = {
            k: v for k, v in self.dirs.items()
            if v != "not_indexed" or k in keep_anchors
        }

    def listing(self, sources_only=False):
        out = []
        for (r, p), nested in self.files.items():
            if not sources_only or not nested:
                out.append((r, p, "file", nested))
        for (r, p), status in self.dirs.items():
            if status == "not_indexed":
                continue
            if sources_only and status != "independent":
                continue
            out.append((r, p, "dir", status == "nested"))
        return sorted(out)


def _sanitize_batch(rows):
    """Drop duplicate paths and rows whose path is a proper ancestor of
    another row in the SAME batch: batch upsert vs sequential model
    would otherwise diverge on file-vs-materialized-dir collisions
    (op input hygiene, not engine semantics)."""
    seen = set()
    uniq = []
    for row in rows:
        key = (row[0], row[1])
        if key not in seen:
            seen.add(key)
            uniq.append(row)
    paths = {(r[0], r[1]) for r in uniq}
    def is_anc_of_other(r, p):
        parts = p.split("/")
        return any(
            (r2, p2) != (r, p) and p2.split("/")[: len(parts)] == parts
            for (r2, p2) in paths if r2 == r
        )
    return [row for row in uniq if not is_anc_of_other(row[0], row[1])]


def _spark_listing(state, sources_only=False):
    return sorted(
        (r["repo"], r["path"], r["kind"], r["is_nested"])
        for r in R.list_indexed(state, sources_only).collect()
    )


@pytest.fixture(scope="module")
def sess(spark):
    return spark


op_add_files = st.lists(
    st.tuples(st.just("r"), _paths()), min_size=1, max_size=3
).map(lambda fs: ("add_files", fs))
op_add_dir = st.tuples(
    _paths(), st.lists(st.tuples(st.just("r"), _paths()), max_size=3)
).map(lambda t: ("add_dir", t))
op_remove = st.tuples(
    st.lists(st.tuples(st.just("r"), _paths(), st.booleans()), max_size=2),
    st.lists(st.tuples(st.just("r"), _paths(), st.booleans()), max_size=1),
).map(lambda t: ("remove", t))

ops_seq = st.lists(
    st.one_of(op_add_files, op_add_dir, op_remove), min_size=1, max_size=5
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(seq=ops_seq)
def test_registry_matches_reference_model(sess, seq):
    spark = sess
    model = Model()
    state = R.empty_state(spark)
    next_id = [0]

    def ids_for(pairs):
        out = []
        for (r, p) in pairs:
            out.append((r, p, next_id[0]))
            next_id[0] += 1
        return out

    for op, payload in seq:
        if op == "add_files":
            rows = _sanitize_batch([
                (r, p, i)
                for (r, p, i) in ids_for(payload)
                # a path that is a dir in EITHER engine is dropped from
                # the op input (op hygiene lives above the engine)
                if (r, p) not in model.dirs
            ])
            if not rows:
                continue
            df = spark.createDataFrame(rows, "repo string, path string, doc_id long")
            state = R.add_file_sources(state, df)
            for (r, p, i) in rows:
                model.add_file(r, p, i)
        elif op == "add_dir":
            dpath, swept = payload
            if ("r", dpath) in model.files:
                continue
            swept_rows = _sanitize_batch([
                (r, p, i)
                for (r, p, i) in ids_for(swept)
                if (r, p) not in model.dirs and ("r", dpath) != (r, p)
            ])
            ddf = spark.createDataFrame([("r", dpath)], "repo string, path string")
            sdf = spark.createDataFrame(
                swept_rows or [], "repo string, path string, doc_id long"
            )
            state = R.add_dir_source(state, ddf, sdf)
            model.add_dir("r", dpath, swept_rows)
        else:
            files_rm, dirs_rm = payload
            fdf = spark.createDataFrame(
                files_rm or [], "repo string, path string, still_exists boolean"
            )
            ddf = spark.createDataFrame(
                dirs_rm or [], "repo string, path string, contains_any_file boolean"
            )
            state = R.remove_items(state, files_to_remove=fdf, dirs_to_remove=ddf)
            model.remove(files_rm, dirs_rm)

        assert _spark_listing(state) == model.listing(), ("ANY", seq)
        assert _spark_listing(state, True) == model.listing(True), ("SRC", seq)
