"""Property test for the vacuum retention invariant (io/epochs.py):
under ANY sequence of appends, compacts, vacuums (random retain_last),
tags and tag deletions, every archived commit the retention window or a
tag keeps must remain FULLY readable — all of its epoch directories on
disk — and everything expired must fail with the friendly range error.
Pure driver-side (epoch dirs are simulated as directories); no Spark.
"""

import json
import posixpath

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from feast_spark.io import epochs as epochs_io
from feast_spark.io.fs import LocalFS

SUBDIRS = ("postings", "stats")


class _Sim:
    """A minimal index honoring the real commit protocol: epoch dirs
    staged first, then commit_manifest — the exact call pattern the
    BM25/minhash/IVF/IVFPQ writers use."""

    def __init__(self, root: str):
        self.root = root
        self.fs = LocalFS()

    def _stage(self, epoch: int) -> None:
        for sub in SUBDIRS:
            d = posixpath.join(self.root, sub, f"epoch={epoch}")
            self.fs.mkdirs(d)
            self.fs.write_bytes_atomic(
                posixpath.join(d, "part-0.parquet"), b"x"
            )

    def build(self) -> None:
        self._stage(0)
        epochs_io.commit_manifest(
            self.root, self.fs, {"kind": "bm25", "epochs": [0]}
        )

    def head(self) -> dict:
        return epochs_io.read_manifest(self.root, self.fs)

    def append(self) -> None:
        head = self.head()
        e = epochs_io.next_epoch(self.root, self.fs, head["epochs"], SUBDIRS)
        self._stage(e)
        epochs_io.commit_manifest(
            self.root, self.fs,
            {**head, "epochs": sorted(head["epochs"] + [e])},
        )

    def compact(self) -> None:
        head = self.head()
        e = epochs_io.next_epoch(self.root, self.fs, head["epochs"], SUBDIRS)
        self._stage(e)
        epochs_io.commit_manifest(
            self.root, self.fs, {**head, "epochs": [e]}
        )

    def vacuum(self, retain_last: int) -> None:
        head = self.head()
        protected, keep_seqs, _ = epochs_io.retention_window(
            self.root, self.fs, retain_last, head_seq=head["commit_seq"]
        )
        epochs_io.vacuum_epochs(
            self.root, self.fs, head["epochs"], SUBDIRS,
            protect_epochs=protected,
        )
        epochs_io.expire_history(self.root, self.fs, keep_seqs)

    def readable(self, seq: int) -> bool:
        m = epochs_io.read_manifest(self.root, self.fs, as_of_seq=seq)
        return all(
            self.fs.exists(posixpath.join(self.root, sub, f"epoch={e}"))
            for sub in SUBDIRS
            for e in m["epochs"]
        )


OPS = st.lists(
    st.one_of(
        st.just(("append",)),
        st.just(("compact",)),
        st.tuples(st.just("vacuum"), st.integers(0, 3)),
        st.tuples(st.just("tag"), st.sampled_from(["a", "b"])),
        st.tuples(st.just("untag"), st.sampled_from(["a", "b"])),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(ops=OPS)
def test_retention_and_tags_keep_every_promised_commit_readable(
    ops, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("sim") / "idx")
    sim = _Sim(root)
    sim.build()
    last_retain = None  # the window promised by the LAST vacuum
    for op in ops:
        if op[0] == "append":
            sim.append()
            last_retain = None  # new commits extend past the old window
        elif op[0] == "compact":
            sim.compact()
            last_retain = None
        elif op[0] == "vacuum":
            sim.vacuum(op[1])
            last_retain = op[1]
        elif op[0] == "tag":
            head_seq = sim.head()["commit_seq"]
            epochs_io.tag_commit(root, sim.fs, op[1], head_seq)
        elif op[0] == "untag":
            tags = epochs_io.read_tags(root, sim.fs)
            if op[1] in tags:
                epochs_io.delete_tag(root, sim.fs, op[1])

        # invariant 1: head is ALWAYS fully readable, by seq too
        head = sim.head()
        assert all(
            sim.fs.exists(posixpath.join(root, sub, f"epoch={e}"))
            for sub in SUBDIRS
            for e in head["epochs"]
        )
        assert sim.readable(head["commit_seq"])

        # invariant 2: every surviving archived commit is FULLY
        # readable — the window is honest, never half-vacuumed
        for seq in epochs_io.history_seqs(root, sim.fs):
            assert sim.readable(seq), f"seq {seq} half-readable"

        # invariant 3: every tag resolves and reads
        for name, seq in epochs_io.read_tags(root, sim.fs).items():
            assert epochs_io.resolve_as_of(root, sim.fs, name) == seq
            assert sim.readable(seq), f"tag {name} -> {seq} unreadable"

        # invariant 4: immediately after a vacuum, the window holds at
        # least min(retain_last, commits so far) non-head commits
        if last_retain is not None:
            seqs = epochs_io.history_seqs(root, sim.fs)
            assert head["commit_seq"] in seqs

    # expired seqs fail with the range error, not a broken read
    seqs = set(epochs_io.history_seqs(root, sim.fs))
    head_seq = sim.head()["commit_seq"]
    for seq in range(1, head_seq + 1):
        if seq not in seqs:
            with pytest.raises(ValueError, match="archived commits"):
                epochs_io.read_manifest(root, sim.fs, as_of_seq=seq)
