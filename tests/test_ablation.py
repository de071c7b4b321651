"""LOWCUT_ABLATE experiment knob (ops/pallas_fft._ABLATE).

The perf-decomposition experiments (experiments/fast_decomp_r05.py) rely
on each token actually disabling its piece of the fused kernel; a token
that silently stops being wired would corrupt a hardware decomposition
without failing anything. Each token runs in a subprocess (the knob is
import-time state) and must CHANGE the interpret-mode output vs the
unablated run; the unablated run must still match the oracle.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent("""
    import json, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %r)
    import jax.numpy as jnp
    from audio_fir_filter_tpu.ops import kernel_design as kd
    from audio_fir_filter_tpu.ops import overlap_save as osv

    taps = kd.highpass_taps(0.05, 128)
    plan = osv.make_plan(taps, precision="fast", block_size=1024,
                         engine="pallas")
    rng = np.random.default_rng(23)
    x = rng.uniform(-1, 1, (2, plan.hop + 37)).astype(np.float32)
    y = np.asarray(osv.same_filter(jnp.asarray(x), plan))
    print(json.dumps({"digest": float(np.nansum(np.abs(y), dtype=np.float64)),
                      "finite": bool(np.isfinite(y).all())}))
""" % REPO)


def _run(ablate: str) -> dict:
    env = dict(os.environ)
    if ablate:
        env["LOWCUT_ABLATE"] = ablate
    else:
        env.pop("LOWCUT_ABLATE", None)
    p = subprocess.run([sys.executable, "-c", CHILD], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-800:]
    return json.loads(p.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_each_token_changes_the_kernel_output():
    full = _run("")
    assert full["finite"]
    # 'dma' only affects the real-TPU DMA prologue, which interpret mode
    # replaces with the same scratch read — assert only that it parses.
    for token in ("tr", "mul", "rolls", "strided", "phaseb", "fft,mul"):
        ab = _run(token)
        assert ab["digest"] != pytest.approx(full["digest"]), token


@pytest.mark.slow
def test_dma_token_parses():
    _run("dma")


def test_unknown_token_rejected():
    p = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "import audio_fir_filter_tpu.ops.pallas_fft" % REPO],
        env=dict(os.environ, LOWCUT_ABLATE="nonsense"),
        capture_output=True, text=True, timeout=120)
    assert p.returncode != 0
    assert "LOWCUT_ABLATE" in p.stderr
