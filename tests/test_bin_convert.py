"""bin_to_st parity: our .bin conversion vs the ACTUAL reference script.

Builds a tiny DeepSpeed-style ``pytorch_model.bin`` (``_forward_module.``
prefixes, LoRA adapters on both the online and the name-mangled ``model_ema``
copies, EMA decay/num_updates counters), runs ``/root/reference/bin_to_st.py``
itself in a subprocess (it reads ``path_to/pytorch_model.bin`` relative to
cwd and writes ``ckpts/vista.safetensors``), and asserts our
``bin_to_state_dict`` — and the convert CLI — produce the identical mapping.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("safetensors")

from vista_tpu.utils.checkpoint import (
    bin_to_state_dict,
    load_safetensors,
    load_torch_bin,
)

REF_SCRIPT = "/root/reference/bin_to_st.py"


def _mangle(name: str) -> str:
    """LitEma's shadow-buffer naming: parameter name with dots stripped
    (reference vwm/modules/ema.py:26-28)."""
    return name.replace(".", "")


def _tiny_bin_state_dict():
    g = torch.Generator().manual_seed(0)
    rnd = lambda *s: torch.randn(*s, generator=g)
    base = "model.diffusion_model.blocks.0.attn1."
    online = {
        base + "to_q.weight": rnd(8, 8),
        base + "to_k.weight": rnd(8, 8),
        base + "to_v.weight": rnd(8, 8),
        base + "to_out.0.weight": rnd(8, 8),
        base + "q_adapter_down.weight": rnd(2, 8),
        base + "q_adapter_up.weight": rnd(8, 2),
        base + "k_adapter_down.weight": rnd(2, 8),
        base + "k_adapter_up.weight": rnd(8, 2),
        base + "v_adapter_down.weight": rnd(2, 8),
        base + "v_adapter_up.weight": rnd(8, 2),
        base + "out_adapter_down.weight": rnd(2, 8),
        base + "out_adapter_up.weight": rnd(8, 2),
        # a frozen non-UNet key: survives untouched
        "first_stage_model.decoder.conv.weight": rnd(4, 4),
    }
    # EMA shadows exist for the UNet params (phase-1 style: everything
    # trainable), under the mangled names, with DIFFERENT values so the
    # swap is observable
    ema = {
        "model_ema." + _mangle(k[len("model."):]): rnd(*v.shape)
        for k, v in online.items() if k.startswith("model.")
    }
    ema["model_ema.decay"] = torch.tensor(0.9999)
    ema["model_ema.num_updates"] = torch.tensor(123)
    sd = {**online, **ema}
    return {"_forward_module." + k: v for k, v in sd.items()}


@pytest.fixture(scope="module")
def reference_output(tmp_path_factory):
    """Run the reference bin_to_st.py on the tiny checkpoint."""
    tmp = tmp_path_factory.mktemp("bin_to_st")
    os.makedirs(tmp / "path_to")
    sd = _tiny_bin_state_dict()
    torch.save(sd, tmp / "path_to" / "pytorch_model.bin")
    proc = subprocess.run([sys.executable, REF_SCRIPT], cwd=tmp,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    return sd, load_safetensors(str(tmp / "ckpts" / "vista.safetensors"))


class TestBinToStParity:
    def test_matches_reference_script(self, reference_output, tmp_path):
        sd_torch, ref_out = reference_output
        sd_np = {k: np.asarray(v.numpy()) for k, v in sd_torch.items()}
        ours = bin_to_state_dict(sd_np)
        assert set(ours) == set(ref_out)
        for k in ref_out:
            np.testing.assert_allclose(ours[k], ref_out[k], atol=1e-6,
                                       err_msg=k)

    def test_cli_bin_roundtrip(self, reference_output, tmp_path):
        sd_torch, ref_out = reference_output
        bin_path = tmp_path / "pytorch_model.bin"
        torch.save(sd_torch, bin_path)
        out_path = tmp_path / "converted.safetensors"
        from vista_tpu.cli.convert import main

        main(["--input", str(bin_path), "--output", str(out_path)])
        got = load_safetensors(str(out_path))
        assert set(got) == set(ref_out)
        for k in ref_out:
            np.testing.assert_allclose(got[k], ref_out[k], atol=1e-6,
                                       err_msg=k)

    def test_ema_weights_replace_online(self, reference_output):
        sd_torch, ref_out = reference_output
        # after conversion the online to_q must equal the EMA shadow with
        # its LoRA adapters merged (not the online to_q + its adapters)
        base = "model.diffusion_model.blocks.0.attn1."
        pre = "_forward_module."
        ema_q = sd_torch[pre + "model_ema." + _mangle(
            "diffusion_model.blocks.0.attn1.to_q.weight")]
        ema_down = sd_torch[pre + "model_ema." + _mangle(
            "diffusion_model.blocks.0.attn1.q_adapter_down.weight")]
        ema_up = sd_torch[pre + "model_ema." + _mangle(
            "diffusion_model.blocks.0.attn1.q_adapter_up.weight")]
        want = (ema_q + ema_up @ ema_down).numpy()
        np.testing.assert_allclose(ref_out[base + "to_q.weight"], want,
                                   atol=1e-6)
        ours = bin_to_state_dict(
            {k: np.asarray(v.numpy()) for k, v in sd_torch.items()})
        np.testing.assert_allclose(ours[base + "to_q.weight"], want,
                                   atol=1e-6)

    def test_counters_dropped_and_no_ema_keys_remain(self, reference_output):
        _, ref_out = reference_output
        assert not any("model_ema" in k for k in ref_out)
        assert not any("decay" in k or "num_updates" in k for k in ref_out)

    def test_clean_dict_without_prefix(self):
        """Already-stripped dicts (our own exports) survive conversion with
        counters dropped — the robustness extension beyond the reference."""
        sd = {
            "model.diffusion_model.a.to_q.weight": np.eye(4, dtype=np.float32),
            "model_ema.diffusion_modelato_qweight": 2 * np.eye(4, dtype=np.float32),
            "model_ema.decay": np.float32(0.999),
        }
        out = bin_to_state_dict(sd)
        assert set(out) == {"model.diffusion_model.a.to_q.weight"}
        np.testing.assert_allclose(out["model.diffusion_model.a.to_q.weight"],
                                   2 * np.eye(4))

    def test_load_torch_bin(self, tmp_path):
        sd = {"a.weight": torch.arange(6, dtype=torch.float32).reshape(2, 3)}
        torch.save(sd, tmp_path / "m.bin")
        got = load_torch_bin(str(tmp_path / "m.bin"))
        np.testing.assert_allclose(got["a.weight"], sd["a.weight"].numpy())
