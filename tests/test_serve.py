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
