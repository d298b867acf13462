"""Weight-for-weight parity of the correction MLPs vs the reference torch nets."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_tpu.models import lbs_field, pose_refine

sys.path.insert(0, "/root/reference")
import torch

# reference modules hard-code .cuda() in places; neuter it for CPU parity runs
torch.Tensor.cuda = lambda self, *a, **k: self
_orig_ones = torch.ones


def _patched_ones(*a, **k):
    t = _orig_ones(*a, **k)
    return t


class TestAutoregressionParity:
    def _build_pair(self, seed=0):
        from nets.mlp_delta_body_pose import Autoregression

        torch.manual_seed(seed)
        ref = Autoregression(device="cpu")
        # map torch weights into our fused-pytree layout
        params = pose_refine.init(jax.random.PRNGKey(0))
        t = ref.block_mlps
        params["trunk0"] = {"w": jnp.asarray(t[0].weight.detach().numpy().T),
                            "b": jnp.asarray(t[0].bias.detach().numpy())}
        params["trunk1"] = {"w": jnp.asarray(t[2].weight.detach().numpy().T),
                            "b": jnp.asarray(t[2].bias.detach().numpy())}
        params["trunk2"] = {"w": jnp.asarray(t[4].weight.detach().numpy().T),
                            "b": jnp.asarray(t[4].bias.detach().numpy())}
        heads_w = np.zeros((pose_refine.NUM_JOINTS, 3, 3 * pose_refine.MAX_SLOTS), np.float32)
        heads_b = np.zeros((pose_refine.NUM_JOINTS, 3), np.float32)
        for j in range(pose_refine.NUM_JOINTS):
            W = ref.fc_pose[j][0].weight.detach().numpy()  # (3, in_j)
            heads_w[j, :, : W.shape[1]] = W
            heads_b[j] = ref.fc_pose[j][0].bias.detach().numpy()
        params["heads_w"] = jnp.asarray(heads_w)
        params["heads_b"] = jnp.asarray(heads_b)
        return ref, params

    def test_ancestors_match_reference(self):
        from nets.mlp_delta_body_pose import Autoregression

        ref = Autoregression(device="cpu")
        for j in range(23):
            assert list(ref.parents_dict[j]) == pose_refine.ANCESTORS[j]

    def test_rs_parity(self, rng):
        ref, params = self._build_pair()
        poses = rng.normal(0, 0.3, size=(1, 72)).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.tensor(poses))
        out = pose_refine.apply(params, jnp.asarray(poses))
        np.testing.assert_allclose(
            np.asarray(out["Rs"]), out_ref["Rs"].numpy(), rtol=1e-4, atol=1e-5
        )

    def test_init_near_identity(self):
        _, params = self._build_pair()
        out = pose_refine.apply(pose_refine.init(jax.random.PRNGKey(1)), jnp.zeros((1, 72)))
        Rs = np.asarray(out["Rs"])
        np.testing.assert_allclose(Rs, np.broadcast_to(np.eye(3), Rs.shape), atol=1e-3)


class TestCrossAttentionParity:
    def _build_pair(self, seed=0):
        from nets.mlp_delta_weight_lbs import CrossAttention_lbs

        torch.manual_seed(seed)
        ref = CrossAttention_lbs()
        params = lbs_field.init(jax.random.PRNGKey(0))

        def conv_to_lin(conv):
            return {"w": jnp.asarray(conv.weight.detach().numpy()[:, :, 0].T),
                    "b": jnp.asarray(conv.bias.detach().numpy())}

        def lin(l):
            return {"w": jnp.asarray(l.weight.detach().numpy().T),
                    "b": jnp.asarray(l.bias.detach().numpy())}

        params["l0"] = conv_to_lin(ref.bw_linears[0])
        params["l1"] = conv_to_lin(ref.bw_linears[1])
        params["l2"] = conv_to_lin(ref.bw_linears[2])
        params["l3"] = conv_to_lin(ref.bw_linears[3])
        params["fc"] = conv_to_lin(ref.bw_fc)
        params["query"] = lin(ref.query)
        params["key"] = lin(ref.key)
        params["value"] = lin(ref.value)
        return ref, params

    def test_skip_concat_order_and_output_parity(self, rng):
        ref, params = self._build_pair()
        pts = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
        Rs = np.broadcast_to(np.eye(3, dtype=np.float32), (23, 3, 3)) + rng.normal(
            0, 0.05, (23, 3, 3)
        ).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.tensor(pts)[None], torch.tensor(Rs)[None])
        out = lbs_field.apply(params, jnp.asarray(pts), jnp.asarray(Rs))
        np.testing.assert_allclose(np.asarray(out), out_ref[0].numpy(), rtol=1e-4, atol=1e-5)
