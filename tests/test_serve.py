"""Continuous-batching serve loop (cli/serve.py serve_loop)."""

from typing import List


class FakeEngine:
    """Records run() batch sizes; echoes per-item texts."""

    def __init__(self):
        self.batches: List[int] = []

    def run(self, imgs):
        self.batches.append(len(imgs))
        out = {}
        for i, im in enumerate(imgs):
            key = im if isinstance(im, str) else i
            out[key] = f"text-{im if isinstance(im, str) else im.sum()}"
        return out


def test_serve_loop_batches_and_order():
    from effocr_tpu.cli.serve import serve_loop

    engine = FakeEngine()
    emitted = []
    reqs = [(f"k{i}", f"path{i}") for i in range(5)]
    served = serve_loop(engine, iter(reqs), lambda k, t: emitted.append(k),
                        batch_size=2, stats_out=None)
    assert served == 5
    # 2 + 2 full batches, 1-item drain flush
    assert engine.batches == [2, 2, 1]
    assert emitted == [f"k{i}" for i in range(5)]


def test_serve_loop_isolates_bad_items():
    """A failing item must not kill the server or the rest of its batch:
    the batch re-runs per item, the bad one emits empty text."""
    from effocr_tpu.cli.serve import serve_loop

    class Flaky(FakeEngine):
        def run(self, imgs):
            if any(im == "bad" for im in imgs):
                raise OSError("cannot decode")
            return super().run(imgs)

    engine = Flaky()
    emitted = []
    reqs = [("k0", "p0"), ("k1", "bad"), ("k2", "p2")]
    served = serve_loop(engine, iter(reqs),
                        lambda k, t: emitted.append((k, t)),
                        batch_size=3, stats_out=None)
    assert served == 3
    assert dict(emitted) == {"k0": "text-p0", "k1": "", "k2": "text-p2"}


def test_watch_requests_stable_size_gating(tmp_path):
    """Files are yielded only once their size is stable across two polls
    (mid-copy uploads wait); processed/moved files are pruned from the
    dedup set."""
    from effocr_tpu.cli.serve import _watch_requests

    d = tmp_path / "watch"
    d.mkdir()
    (d / "a.png").write_bytes(b"x" * 10)

    gen = _watch_requests(str(d), poll_s=0.01)
    got, ticks = [], 0
    for item in gen:
        if item is None:
            ticks += 1
            if ticks == 1:
                # grows between polls -> must NOT have been yielded yet
                assert got == []
                (d / "a.png").write_bytes(b"x" * 20)
            if ticks >= 6:
                break
        else:
            got.append(item[0])
    assert got == [str(d / "a.png")]


def test_serve_loop_latency_flush():
    """A partial batch flushes once the oldest request exceeds
    max_latency_s; None poll ticks drive the check while idle."""
    from effocr_tpu.cli.serve import serve_loop

    engine = FakeEngine()
    clock = [0.0]

    def now():
        return clock[0]

    def requests():
        yield ("a", "pa")         # one request, then idle ticks
        clock[0] += 0.03
        yield None                # 0.03s: below the 0.05s latency cap
        clock[0] += 0.03
        yield None                # 0.06s: cap exceeded -> flush [1]
        yield ("b", "pb")
        yield ("c", "pc")         # batch_size=2 -> immediate flush [2]

    emitted = []
    served = serve_loop(engine, requests(),
                        lambda k, t: emitted.append((k, t)),
                        batch_size=2, max_latency_s=0.05, now=now,
                        stats_out=None)
    assert served == 3
    assert engine.batches == [1, 2]
    assert [k for k, _ in emitted] == ["a", "b", "c"]
    assert emitted[0][1] == "text-pa"
