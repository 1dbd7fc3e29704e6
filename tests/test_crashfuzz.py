"""Randomized crash-point fuzzing of every store mutation journal.

The directed recovery tests (test_store.py) pin one crash point per
journal; this harness kills each mutating operation at EVERY
state-changing filesystem call (os.replace / rename / remove /
truncate / ftruncate / fsync) and asserts the two invariants the
reference's qdrant-local-mode store provided implicitly and this store
must provide explicitly (reference core_system.py:521,608-622):

  1. atomic visibility — after a crash + reopen, the store reads as
     EITHER the full pre-op state or the full post-op state, never a
     mix (open() rolls committed journals forward and sweeps
     uncommitted stage files);
  2. retry convergence — if the crash left the pre-op state, re-running
     the operation cleanly lands the post-op state.

Simulation caveat: the process keeps its page cache, so a crash at an
fsync behaves like a crash just before the following syscall; torn
partial WRITES are covered separately by the directed torn-tail tests.
The on-disk tree is snapshotted immediately after the simulated crash
(while the wounded handle is still referenced) so interpreter-exit
buffer flushes cannot contaminate the assertions.
"""
import os
import shutil

import numpy as np
import pytest

from reverso_tpu.store import VectorStore

from test_topk import random_unit

D = 16
N0 = 20


class CrashPoint(BaseException):
    """Raised to simulate the process dying mid-syscall. BaseException
    so broad `except Exception` recovery guards inside the store can't
    swallow the simulated death."""


_INTERCEPT = ("replace", "rename", "remove", "truncate", "ftruncate",
              "fsync")


class _Injector:
    def __init__(self, crash_at=None):
        self.calls = 0
        self.crash_at = crash_at
        self._real = {}

    def __enter__(self):
        for name in _INTERCEPT:
            real = getattr(os, name)
            self._real[name] = real

            def wrapper(*a, _real=real, **kw):
                if self.crash_at is not None and self.calls >= self.crash_at:
                    raise CrashPoint()
                self.calls += 1
                return _real(*a, **kw)

            setattr(os, name, wrapper)
        return self

    def __exit__(self, *exc):
        for name, real in self._real.items():
            setattr(os, name, real)
        return False


def _state(root, name="db"):
    """Full logical store state: (count, per-space vector bytes,
    payloads, per-ragged-space rows) — covers every named vector space
    AND every sparse/multivector space."""
    s = VectorStore.open(root, name)
    blobs = tuple(np.asarray(s.vectors(sp)[: s.count]).copy().tobytes()
                  for sp in sorted(s.spaces()))
    sp_rows = tuple(
        tuple((r["indices"].tobytes(), r["values"].tobytes())
              for r in s.sparse_rows(sp, range(s.count)))
        for sp in sorted(s.sparse))
    mv_rows = tuple(
        tuple(r.tobytes() for r in s.multivector_rows(sp, range(s.count)))
        for sp in sorted(s.multi))
    pays = s.payloads(list(range(s.count)))
    dels = tuple((sp, tuple(s.deleted_rows(sp).tolist()))
                 for sp in sorted(s.spaces()))
    s.close()
    return s.count, blobs, pays, sp_rows, mv_rows, dels


DT = 8    # named-space dim, deliberately != D to catch dim mixups


def _sparse_rows(rng, n):
    rows = []
    for _ in range(n):
        nnz = int(rng.integers(0, 5))
        rows.append({"indices": rng.choice(64, size=nnz, replace=False),
                     "values": rng.normal(size=nnz).astype(np.float32)})
    return rows


def _multi_rows(rng, n):
    return [rng.normal(size=(int(rng.integers(0, 4)), DT))
            .astype(np.float32) for _ in range(n)]


def _make_template(base, kind="plain") -> str:
    root = os.path.join(base, f"template_{kind}")
    rng = np.random.default_rng(0)
    vecs = random_unit(rng, N0, D)
    pays = [{"region_id": f"r{i}", "n": i,
             "cls": "a" if i % 3 else "b"} for i in range(N0)]
    if kind == "named":
        with VectorStore.create(root, "db", D, named={"text": DT}) as s:
            s.append({"": vecs, "text": random_unit(rng, N0, DT)}, pays)
    elif kind == "deleted":
        # named template with pre-existing delete_vectors masks, so
        # compact/truncate/update_vectors fuzz their mask interplay
        # (remap, clip, resurrect)
        with VectorStore.create(root, "db", D, named={"text": DT}) as s:
            s.append({"": vecs, "text": random_unit(rng, N0, DT)}, pays)
        w = VectorStore.open(root, "db", writable=True)
        w.delete_vector_rows([2, 5, 15], "")
        w.delete_vector_rows([4], "text")
        w.close()
    elif kind == "sparse":
        with VectorStore.create(root, "db", D,
                                sparse={"text": {}}) as s:
            s.append(vecs, pays, {"text": _sparse_rows(rng, N0)})
    elif kind == "multi":
        with VectorStore.create(root, "db", D, multi={"tok": DT}) as s:
            s.append(vecs, pays,
                     multi_vectors={"tok": _multi_rows(rng, N0)})
    else:
        with VectorStore.create(root, "db", D) as s:
            s.append(vecs, pays)
    return root


def _run_op(op, root):
    """Open, mutate, close — the crash window covers all three (append
    commits in close()'s flush). On a simulated crash the wounded
    handle is returned un-closed, exactly as a dying process leaves
    it; True marks a crash during open() itself."""
    s = None
    try:
        s = VectorStore.open(root, "db", writable=True)
        op(s)
        s.close()
    except CrashPoint:
        return s if s is not None else True
    return None


def _unlock(root):
    try:
        os.remove(os.path.join(root, "db", ".lock"))
    except OSError:
        pass


RNG = np.random.default_rng(7)
NEW_VECS = random_unit(RNG, 4, D)
NEW_TVECS = random_unit(RNG, 4, DT)
NEW_SPARSE = _sparse_rows(RNG, 4)
NEW_MULTI = _multi_rows(RNG, 4)
NEW_PAYS = [{"region_id": f"x{i}", "n": 100 + i} for i in range(4)]
KEEP = np.ones(N0, bool)
KEEP[[3, 7, 11]] = False
UPD_ROWS = [2, 5, 9]
UPD_VECS = random_unit(RNG, 3, D)
UPD_TVECS = random_unit(RNG, 3, DT)
UPD_SPARSE = [{"indices": [0, 63], "values": [1.0, -1.0]}, None,
              {"indices": [5], "values": [9.0]}]
UPD_MULTI = _multi_rows(RNG, 3)


def _append(s):
    s.append(NEW_VECS if not s.named
             else {"": NEW_VECS, "text": NEW_TVECS}, NEW_PAYS,
             {"text": NEW_SPARSE} if s.sparse else None,
             {"tok": NEW_MULTI} if s.multi else None)


OPS = {
    "append": _append,
    "truncate": lambda s: s.truncate(12),
    "compact": lambda s: s.compact(KEEP),
    "update_payloads": lambda s: s.update_payloads(
        UPD_ROWS, patch={"tag": "hit"}, mode="set"),
    "update_vectors": lambda s: s.update_vectors(UPD_ROWS, UPD_VECS),
    "update_vectors_named": lambda s: s.update_vectors(
        UPD_ROWS, UPD_TVECS, space="text"),
    "update_sparse": lambda s: s.update_sparse_vectors(
        UPD_ROWS, UPD_SPARSE, "text"),
    "update_multi": lambda s: s.update_multivectors(
        UPD_ROWS, UPD_MULTI, "tok"),
    "delete_vectors": lambda s: s.delete_vector_rows([1, 4, 9]),
}


@pytest.mark.parametrize("kind", ["plain", "named", "sparse", "multi",
                                  "deleted"])
@pytest.mark.parametrize("opname", sorted(OPS))
def test_crash_at_every_syscall(tmp_path, opname, kind):
    if opname == "update_vectors_named" and kind not in ("named",
                                                         "deleted"):
        pytest.skip("named-space op needs the named template")
    if opname == "update_sparse" and kind != "sparse":
        pytest.skip("sparse op needs the sparse template")
    if opname == "update_multi" and kind != "multi":
        pytest.skip("multivector op needs the multi template")
    op = OPS[opname]
    template = _make_template(str(tmp_path), kind=kind)
    before = _state(template)

    # clean run: the post-op truth and the syscall count
    clean = str(tmp_path / "clean")
    shutil.copytree(template, clean)
    with _Injector() as inj:
        assert _run_op(op, clean) is None
    after = _state(clean)
    total = inj.calls
    assert total > 0, "op made no intercepted syscalls — fuzz is inert"
    assert after != before

    for crash_at in range(total):
        work = str(tmp_path / f"crash{crash_at}")
        shutil.copytree(template, work)
        with _Injector(crash_at) as inj:
            wounded = _run_op(op, work)
        # snapshot the crash-time disk state while the wounded handle
        # is still alive (its buffers must not flush into what we read)
        snap = str(tmp_path / f"snap{crash_at}")
        shutil.copytree(work, snap)
        del wounded
        _unlock(snap)

        got = _state(snap)          # read-only open: rolls forward
        assert got == before or got == after, (
            f"{opname} crash@{crash_at}: mixed state "
            f"(count={got[0]}, before={before[0]}, after={after[0]})")

        # reopen stability: recovery must be idempotent
        assert _state(snap) == got, f"{opname} crash@{crash_at}: unstable"

        if got == before:
            # retry converges
            assert _run_op(op, snap) is None, (
                f"{opname} crash@{crash_at}: clean retry crashed")
            assert _state(snap) == after, (
                f"{opname} crash@{crash_at}: retry did not converge")
        shutil.rmtree(work)
        shutil.rmtree(snap)


BATCH_SEQ = [
    ("append", lambda s: s.append(NEW_VECS, NEW_PAYS)),
    ("update_payloads", lambda s: s.update_payloads(
        UPD_ROWS, patch={"tag": "hit"}, mode="set")),
    ("compact", lambda s: s.compact(
        np.r_[KEEP, np.ones(len(NEW_VECS), bool)])),
    ("update_vectors", lambda s: s.update_vectors(UPD_ROWS, UPD_VECS)),
    ("delete_vectors", lambda s: s.delete_vector_rows([1, 2])),
]


def test_crash_at_every_syscall_batch(tmp_path):
    """Kill a multi-op writable session (the store sequence
    `Reverso.update_batch` composes) at every syscall: each op commits
    through its own journal, so a crash must leave EXACTLY a prefix of
    the sequence applied — one of the N+1 op-boundary states, never a
    mix — and recovery must be reopen-stable. (Whole-batch retry is the
    caller's job and is not idempotent across an applied prefix, so no
    retry-convergence clause here — that's per-op, covered above.)"""
    template = _make_template(str(tmp_path))

    def run_seq(root):
        s = None
        try:
            s = VectorStore.open(root, "db", writable=True)
            for _, op in BATCH_SEQ:
                op(s)
            s.close()
        except CrashPoint:
            return s if s is not None else True
        return None

    # clean run per prefix: the N+1 legal op-boundary states
    states = [_state(template)]
    for n in range(1, len(BATCH_SEQ) + 1):
        pref = str(tmp_path / f"pref{n}")
        shutil.copytree(template, pref)
        s = VectorStore.open(pref, "db", writable=True)
        for _, op in BATCH_SEQ[:n]:
            op(s)
        s.close()
        states.append(_state(pref))
        shutil.rmtree(pref)
    assert len({st[0:1] + (st[1][0][:40],) for st in states}) > 1

    clean = str(tmp_path / "clean")
    shutil.copytree(template, clean)
    with _Injector() as inj:
        assert run_seq(clean) is None
    assert _state(clean) == states[-1]
    total = inj.calls
    assert total > 0
    shutil.rmtree(clean)

    for crash_at in range(total):
        work = str(tmp_path / f"bc{crash_at}")
        shutil.copytree(template, work)
        with _Injector(crash_at):
            wounded = run_seq(work)
        snap = str(tmp_path / f"bs{crash_at}")
        shutil.copytree(work, snap)
        del wounded
        _unlock(snap)
        got = _state(snap)
        assert got in states, (
            f"batch crash@{crash_at}: state is not an op-boundary "
            f"prefix (count={got[0]}, legal counts="
            f"{[st[0] for st in states]})")
        assert _state(snap) == got, f"batch crash@{crash_at}: unstable"
        shutil.rmtree(work)
        shutil.rmtree(snap)


@pytest.mark.parametrize("kind", ["plain", "named", "sparse"])
def test_crash_at_every_syscall_import_snapshot(tmp_path, kind):
    """Snapshot import stages + atomically renames into place: after a
    crash the target db either doesn't exist or is complete; retry
    converges (import overwrites a half-staged leftover)."""
    from reverso_tpu.store import StoreError

    template = _make_template(str(tmp_path), kind=kind)
    with VectorStore.open(template, "db") as s:
        tar = s.export_snapshot(str(tmp_path / "db.snapshot"))
    after = _state(template)

    def run_import(dest):
        try:
            VectorStore.import_snapshot(dest, "db", tar).close()
        except CrashPoint:
            return True
        return None

    clean = str(tmp_path / "clean")
    with _Injector() as inj:
        assert run_import(clean) is None
    assert _state(clean) == after
    total = inj.calls
    assert total > 0

    for crash_at in range(total):
        work = str(tmp_path / f"imp{crash_at}")
        with _Injector(crash_at):
            run_import(work)
        try:
            got = _state(work)
        except StoreError:
            got = None                      # not (yet) a database
        assert got is None or got == after, f"import crash@{crash_at}"
        assert run_import(work) is None, (
            f"import crash@{crash_at}: retry crashed")
        assert _state(work) == after, (
            f"import crash@{crash_at}: retry did not converge")
        shutil.rmtree(work)
