"""Checkpointable data streams: exact batch-sequence identity across
save/restore mid-epoch (what the reference lacks — it only reseeds,
reference train/train.py:318-323), multiprocess loading, epoch reseed."""

import io
import json
import tarfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from mllm_npu_tpu.data.dataloader import (DataLoader,
                                          MultiProcessDataLoader,
                                          make_dataloader)
from mllm_npu_tpu.data.processor import ImageProcessor
from mllm_npu_tpu.data.streams import SampleMultiplexer
from mllm_npu_tpu.data.tasks.image_caption import (
    build_caption_datapipes_with_pixels)
from mllm_npu_tpu.data.tasks.pure_text import build_text_datapipes
from mllm_npu_tpu.utils.testing import FakeTokenizer

TOK = FakeTokenizer()
PROC = ImageProcessor(height=56, width=56)


def _img_bytes(i=0):
    buf = io.BytesIO()
    Image.new("RGB", (500, 500), ((i * 37) % 256, 64, 128)).save(
        buf, format="JPEG")
    return buf.getvalue()


def _make_caption_tar(path: Path, start=0, n=6):
    with tarfile.open(path, "w") as tar:
        for i in range(start, start + n):
            for ext, data in (
                    (".txt", f"a photo of thing {i}".encode()),
                    (".jpg", _img_bytes(i)),
                    (".json", json.dumps({"similarity": 0.9}).encode())):
                info = tarfile.TarInfo(f"sample{i:04d}{ext}")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))


def _make_jsonl(path: Path, start=0, n=20):
    with open(path, "w") as f:
        for i in range(start, start + n):
            f.write(json.dumps({"text": f"text sample number {i}"}) + "\n")


def _caption_pipe(tmp_path, seed=7, cycle_count=4):
    return build_caption_datapipes_with_pixels(
        str(tmp_path), tokenizer=TOK, max_length=64, batch_size=2,
        similarity_thr=0.2, min_resolution=100, image_transform=PROC,
        num_img_in_tokens=4, num_img_out_tokens=4,
        cycle_count=cycle_count, dataset_name="test",
        shard_for_host=False, seed=seed)


def _text_pipe(tmp_path, seed=7, cycle_count=4):
    return build_text_datapipes(
        str(tmp_path), tokenizer=TOK, max_length=32, batch_size=4,
        cycle_count=cycle_count, dataset_name="txt",
        shard_for_host=False, seed=seed)


def _batch_fingerprint(b):
    return tuple(np.asarray(b["input_ids"]).reshape(-1).tolist())


def _assert_same_batches(got, want):
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert _batch_fingerprint(g) == _batch_fingerprint(w), \
            f"batch {i} diverged after resume"


class _ExitingPipeFactory:
    """Kills its worker process mid-iteration with no exception —
    simulating an OOM-kill/segfault the queue protocol can't report."""

    def __call__(self, seed):
        import os

        def gen():
            os._exit(9)
            yield  # pragma: no cover
        return gen()


def test_dead_worker_raises_instead_of_hanging(tmp_path):
    """A worker that dies without enqueueing must surface as a
    RuntimeError in the parent, not an eternal queue.get()."""
    loader = MultiProcessDataLoader(_ExitingPipeFactory(), num_workers=1,
                                    prefetch=2, mp_context="spawn")
    with pytest.raises(RuntimeError, match="died"):
        next(iter(loader))


def test_caption_stream_resume_mid_epoch(tmp_path):
    _make_caption_tar(tmp_path / "shard-000.tar", 0)
    _make_caption_tar(tmp_path / "shard-001.tar", 6)

    full = list(_caption_pipe(tmp_path))
    assert len(full) >= 6

    pipe = _caption_pipe(tmp_path)
    it = iter(pipe)
    consumed = [next(it) for _ in range(3)]
    _assert_same_batches(consumed, full[:3])
    state = pipe.state_dict()

    # fresh pipe restored from the state resumes the EXACT sequence
    pipe2 = _caption_pipe(tmp_path)
    pipe2.load_state_dict(state)
    rest = list(pipe2)
    _assert_same_batches(rest, full[3:])


def test_jsonl_stream_resume_and_permutation(tmp_path):
    _make_jsonl(tmp_path / "a.jsonl", 0)
    _make_jsonl(tmp_path / "b.jsonl", 100)

    full = list(_text_pipe(tmp_path))
    assert len(full) >= 8
    # per-file permutation actually shuffles within a file
    ids0 = np.asarray(full[0]["input_ids"])
    assert not np.array_equal(ids0, np.sort(ids0, axis=0)) or len(full) > 1

    pipe = _text_pipe(tmp_path)
    it = iter(pipe)
    consumed = [next(it) for _ in range(5)]
    state = pipe.state_dict()
    pipe2 = _text_pipe(tmp_path)
    pipe2.load_state_dict(state)
    _assert_same_batches(list(pipe2), full[5:])
    _assert_same_batches(consumed, full[:5])


def test_multiplexer_resume(tmp_path):
    cap_dir, txt_dir = tmp_path / "cap", tmp_path / "txt"
    cap_dir.mkdir(), txt_dir.mkdir()
    _make_caption_tar(cap_dir / "s.tar", 0)
    _make_jsonl(txt_dir / "t.jsonl", 0)

    def make_mux():
        return SampleMultiplexer(
            {_caption_pipe(cap_dir, cycle_count=2): 1.0,
             _text_pipe(txt_dir, cycle_count=2): 1.0}, seed=3)

    full = list(make_mux())
    mux = make_mux()
    it = iter(mux)
    consumed = [next(it) for _ in range(4)]
    state = mux.state_dict()

    mux2 = make_mux()
    mux2.load_state_dict(state)
    _assert_same_batches(list(mux2), full[4:])
    _assert_same_batches(consumed, full[:4])


def test_dataloader_resume_through_prefetch(tmp_path):
    """The loader's state must track batches YIELDED to the trainer, not
    batches produced into the prefetch queue."""
    _make_caption_tar(tmp_path / "s.tar", 0)

    def factory(seed):
        return _caption_pipe(tmp_path, seed=seed)

    full = list(iter(DataLoader(factory, prefetch=2)))

    loader = DataLoader(factory, prefetch=2)
    it = iter(loader)
    consumed = [next(it) for _ in range(3)]
    import time
    time.sleep(0.3)   # let the producer thread race ahead
    state = loader.state_dict()

    loader2 = DataLoader(factory, prefetch=2)
    loader2.load_state_dict(state)
    _assert_same_batches(list(iter(loader2)), full[3:])
    _assert_same_batches(consumed, full[:3])


def test_dataloader_epoch_reseed(tmp_path):
    _make_jsonl(tmp_path / "t.jsonl", 0, n=40)

    def factory(seed):
        return _text_pipe(tmp_path, seed=seed, cycle_count=1)

    loader = DataLoader(factory, prefetch=2)
    epoch0 = [_batch_fingerprint(b) for b in iter(loader)]
    loader.next_epoch()
    epoch1 = [_batch_fingerprint(b) for b in iter(loader)]
    assert len(epoch0) == len(epoch1)
    assert epoch0 != epoch1, "epoch reseed must change the sample order"


def test_multiprocess_loader_matches_single_worker_round_robin(tmp_path):
    """2-worker loader = deterministic round-robin interleave of the two
    per-worker file-shard streams."""
    _make_jsonl(tmp_path / "a.jsonl", 0)
    _make_jsonl(tmp_path / "b.jsonl", 100)
    _make_jsonl(tmp_path / "c.jsonl", 200)
    _make_jsonl(tmp_path / "d.jsonl", 300)

    def factory(seed):
        return _text_pipe(tmp_path, seed=seed, cycle_count=1)

    loader = MultiProcessDataLoader(factory, num_workers=2, prefetch=2)
    try:
        got = [_batch_fingerprint(b) for b in iter(loader)]
    finally:
        loader.shutdown()
    assert got

    # expected: worker w sees files[w::2]
    from mllm_npu_tpu.data import streams
    per_worker = []
    for w in range(2):
        streams.set_worker_shard(w, 2)
        streams.set_host_shard(0, 1)
        try:
            per_worker.append(
                [_batch_fingerprint(b) for b in factory(888)])
        finally:
            streams.set_worker_shard(0, 1)
            streams.set_host_shard(None, None)
    want = []
    iters = [iter(x) for x in per_worker]
    done = [False, False]
    rr = 0
    while not all(done):
        w = rr % 2
        rr += 1
        if done[w]:
            continue
        try:
            want.append(next(iters[w]))
        except StopIteration:
            done[w] = True
    assert got == want


@pytest.mark.slow
def test_multiprocess_loader_resume(tmp_path):
    _make_jsonl(tmp_path / "a.jsonl", 0)
    _make_jsonl(tmp_path / "b.jsonl", 100)

    def factory(seed):
        return _text_pipe(tmp_path, seed=seed, cycle_count=2)

    loader = MultiProcessDataLoader(factory, num_workers=2, prefetch=2)
    try:
        full = [_batch_fingerprint(b) for b in iter(loader)]
    finally:
        loader.shutdown()

    loader1 = MultiProcessDataLoader(factory, num_workers=2, prefetch=2)
    it = iter(loader1)
    consumed = [_batch_fingerprint(next(it)) for _ in range(3)]
    state = loader1.state_dict()
    loader1.shutdown()

    # JSON round-trip: states must survive the checkpoint format
    state = json.loads(json.dumps(state))

    loader2 = MultiProcessDataLoader(factory, num_workers=2, prefetch=2)
    loader2.load_state_dict(state)
    try:
        rest = [_batch_fingerprint(b) for b in iter(loader2)]
    finally:
        loader2.shutdown()
    assert consumed == full[:3]
    assert rest == full[3:]


class _PicklableTextFactory:
    def __init__(self, root, cycle_count=1):
        self.root = str(root)
        self.cycle_count = cycle_count

    def __call__(self, seed):
        return build_text_datapipes(
            self.root, tokenizer=FakeTokenizer(), max_length=32,
            batch_size=4, cycle_count=self.cycle_count,
            dataset_name="txt", shard_for_host=False, seed=seed)


@pytest.mark.slow
def test_multiprocess_loader_spawn_workers(tmp_path):
    """A picklable factory must run under the default spawn context (the
    TPU-safe path — no forking a process that owns the runtime)."""
    _make_jsonl(tmp_path / "a.jsonl", 0)
    _make_jsonl(tmp_path / "b.jsonl", 100)

    loader = MultiProcessDataLoader(_PicklableTextFactory(tmp_path),
                                    num_workers=2, prefetch=2,
                                    mp_context="spawn")
    try:
        got = [_batch_fingerprint(b) for b in iter(loader)]
    finally:
        loader.shutdown()
    assert got


def test_state_is_json_safe(tmp_path):
    _make_caption_tar(tmp_path / "s.tar", 0)
    pipe = _caption_pipe(tmp_path)
    it = iter(pipe)
    next(it)
    state = json.loads(json.dumps(pipe.state_dict()))
    pipe2 = _caption_pipe(tmp_path)
    pipe2.load_state_dict(state)   # must not raise


def test_unpicklable_factory_falls_back_to_threads(tmp_path):
    """An unpicklable (closure) factory must fall back to THREAD workers
    — never fork, which can deadlock a multi-threaded parent — and the
    thread workers must produce the exact batch sequence of process
    workers (same disjoint shard split via thread-local shard state,
    same round-robin)."""
    _make_jsonl(tmp_path / "a.jsonl", 0)
    _make_jsonl(tmp_path / "b.jsonl", 100)

    def closure_factory(seed):  # not picklable → spawn start must fail
        return _text_pipe(tmp_path, seed=seed, cycle_count=1)

    fallback = MultiProcessDataLoader(closure_factory, num_workers=2,
                                      prefetch=2, mp_context="spawn")
    try:
        got = [_batch_fingerprint(b) for b in iter(fallback)]
    finally:
        fallback.shutdown()
    assert got

    # reference: REAL process workers (spawn — never fork a JAX-owning
    # parent) running a picklable factory equivalent to the closure;
    # FakeTokenizer hashing is crc32, so ids match across interpreters
    ref = MultiProcessDataLoader(
        _PicklableTextFactory(tmp_path, cycle_count=1), num_workers=2,
        prefetch=2, mp_context="spawn")
    try:
        want = [_batch_fingerprint(b) for b in iter(ref)]
    finally:
        ref.shutdown()
    assert got == want
