"""Batch-render checkpoint/resume (SURVEY §5.4): a preempted `-N` render
restarts from the saved accumulator and produces the SAME image as an
uninterrupted run (the online mean + deterministic sampler make the
resumed samples bit-identical); stale/mismatched snapshots are refused."""
import numpy as np
import pytest

from gpu_raytracer_tpu import __main__ as cli
from gpu_raytracer_tpu.integrators.pathtracer import Pathtracer

SCENE = "/root/reference/Data/cornellbox/scene.xml"


def _args(out, ck=None, n=3, extra=()):
    a = [SCENE, "-W", "32", "-H", "32", "-N", str(n), "-o", str(out)]
    if ck is not None:
        a += ["--checkpoint", str(ck), "--checkpoint-every", "0"]
    return a + list(extra)


def _png(path):
    from PIL import Image

    return np.asarray(Image.open(path))


def test_resume_matches_uninterrupted(tmp_path, monkeypatch):
    straight = tmp_path / "straight.png"
    assert cli.main(_args(straight)) == 0

    # Interrupt after 2 of 3 samples: checkpoint-every 0 saves after each
    # non-final sample, so the snapshot on disk is at sample_index 2.
    ck = tmp_path / "ck.npz"
    out = tmp_path / "resumed.png"
    real_render = Pathtracer.render
    calls = []

    def dying_render(self):
        if len(calls) == 2:
            raise KeyboardInterrupt
        calls.append(1)
        return real_render(self)

    monkeypatch.setattr(Pathtracer, "render", dying_render)
    with pytest.raises(KeyboardInterrupt):
        cli.main(_args(out, ck))
    assert ck.exists()
    snap = np.load(ck)
    assert int(snap["sample_index"]) == 2

    monkeypatch.setattr(Pathtracer, "render", real_render)
    assert cli.main(_args(out, ck)) == 0
    assert not ck.exists()  # completed render removes the snapshot
    np.testing.assert_array_equal(_png(out), _png(straight))


def test_mismatched_checkpoint_refused(tmp_path, capsys):
    ck = tmp_path / "ck.npz"
    np.savez(ck, accumulator=np.zeros((32 * 32, 3), np.float32),
             sample_index=2, fingerprint="something else entirely")
    out = tmp_path / "out.png"
    assert cli.main(_args(out, ck, n=1)) == 0
    assert "different render configuration" in capsys.readouterr().out
    img = _png(out)
    assert img.mean() > 1.0  # rendered from scratch, not the zero snapshot
