"""Few-shot adaptive-SPADE generator (reference FewShotGenerator,
models/networks/generator.py:20-454), re-designed for TPU/XLA.

Key departures from the torch reference (SURVEY §7 design stance):
  * All per-sample generated-weight convs run as single grouped convs
    (`batch_conv` via vmap) instead of Python loops over the batch.
  * Reference-derived state (bottleneck features + generated weights) is an
    explicit pytree (`RefCache`) instead of attributes mutated on the module
    (generator.py:415-418), so inference under `lax.scan` carries it as scan
    state — and, for n_shot == 1, the whole reference encoder is skipped for
    t > 0 (the torch code re-runs the encoder downs every frame).
  * The torch "flat fc output -> split_weights/reshape_weight" element order is
    reproduced exactly (base_network.py:142-167) so ported checkpoints generate
    bit-identical weights.

Structure (generator.py:181-229 forward):
  weight_generation: encode K reference images (+ label maps, multiplied via
  channel-softmax outer product), attention-combine for K > 1, run per-layer
  spectral-norm fc MLPs producing SPADE mlp / label-embedding conv weights;
  flow_generation: warp picked reference (and previous frames) with predicted
  flow; SPADE_combine: embed warped images as extra SPADE maps; main branch:
  n_downsample_G+1 SPADE resblocks with 2x nearest upsampling; linear- or
  SPADE-combine of raw/warped outputs.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fsvid2vid_tpu.config import Config
from fsvid2vid_tpu.models.embedder import LabelEmbedder, channel_schedule
from fsvid2vid_tpu.models.flow_generator import FlowGenerator
from fsvid2vid_tpu.models.layers import (
    SNConv, SNDense, SpadeConv2d, SpadeResnetBlock, xavier_normal_init)
from fsvid2vid_tpu.ops.batch_conv import batch_conv
from fsvid2vid_tpu.ops.image_ops import (
    adaptive_avg_pool, leaky_relu, upsample_nearest)
from fsvid2vid_tpu.ops.spd import (
    depth_to_space, space_to_depth, spd_upsample_enter)
from fsvid2vid_tpu.ops.warp import flow_warp


def pick_ref(refs: jnp.ndarray, ref_idx: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Gather the most-attended reference (base_network.py:40-47).

    refs: (B, K, H, W, C); ref_idx: (B,) int or None -> first reference."""
    if ref_idx is None:
        return refs[:, 0]
    idx = ref_idx.reshape(-1, 1, 1, 1, 1)
    return jnp.take_along_axis(refs, idx, axis=1)[:, 0]


class FewShotGenerator(nn.Module):
    cfg: Config
    for_face: bool = False   # face-refinement sub-generator (no flow branches)
    atn_chunk_elems: int = 1 << 23  # streaming-attention energy-slab budget
    atn_flash: str = "auto"  # K>1 eval attention kernel: 'auto' (Pallas
    # flash-attention on TPU, ops/pallas/attention_kernel.py), 'off' (always
    # the XLA chunked path), 'interpret' (Pallas emulation — tests)

    # ------------------------------------------------------------------
    # derived sizes
    # ------------------------------------------------------------------
    @property
    def nd(self) -> int:
        return self.cfg.n_downsample_G

    @property
    def ch(self) -> List[int]:
        # nf_max = min(1024, nf * 2^n_downsample_G) (generator.py:28-29)
        nf_max = min(1024, self.cfg.ngf * (2 ** self.nd))
        return channel_schedule(self.cfg.ngf, self.nd + 1, nf_max)

    @property
    def n_adaptive(self) -> int:
        return self.cfg.n_adaptive

    @property
    def warp_ref(self) -> bool:
        return self.cfg.warp_ref and not self.for_face  # generator.py:148

    @property
    def adap_spade(self) -> bool:
        return self.cfg.adaptive_spade

    @property
    def adap_embed(self) -> bool:
        return self.cfg.adap_embed

    @property
    def adap_conv(self) -> bool:
        return self.cfg.adaptive_conv

    @property
    def mul_label_ref(self) -> bool:
        return "mul" in self.cfg.use_label_ref

    @property
    def concat_label_ref(self) -> bool:
        return "concat" in self.cfg.use_label_ref

    def hidden_ncs(self, i: int) -> List[int]:
        """SPADE modulation-map channels at layer i (generator.py:39-42)."""
        if self.cfg.spade_combine and i < self.cfg.n_sc_layers:
            return [self.ch[i]] * 3
        return [self.ch[i]]

    # ------------------------------------------------------------------
    # submodules
    # ------------------------------------------------------------------
    def setup(self):
        cfg = self.cfg
        ch = self.ch
        norm = cfg.norm_G
        norm_ref = norm.replace("spade", "")
        input_nc = cfg.gen_input_nc
        ref_nc = cfg.output_nc + (input_nc if self.concat_label_ref else 0)

        del ref_nc, input_nc  # input channels are inferred by flax
        self.ref_img_first = SpadeConv2d(cfg.ngf, norm=norm_ref)
        if self.mul_label_ref:
            self.ref_label_first = SpadeConv2d(cfg.ngf, norm=norm_ref)

        ref_img_down, ref_img_up = [], []
        ref_label_down, ref_label_up = [], []
        for i in range(self.nd):
            if cfg.res_for_ref:
                ref_img_down.append(SpadeResnetBlock(
                    ch[i], ch[i + 1], norm=norm_ref, stride=2))
                ref_img_up.append(SpadeResnetBlock(
                    ch[i + 1], ch[i], norm=norm_ref))
            else:
                ref_img_down.append(SpadeConv2d(ch[i + 1], norm=norm_ref, stride=2))
                ref_img_up.append(SpadeConv2d(ch[i], norm=norm_ref))
            if self.mul_label_ref:
                ref_label_down.append(SpadeConv2d(ch[i + 1], norm=norm_ref, stride=2))
                ref_label_up.append(SpadeConv2d(ch[i], norm=norm_ref))
        self.ref_img_down = ref_img_down
        self.ref_img_up = ref_img_up
        self.ref_label_down = ref_label_down
        self.ref_label_up = ref_label_up

        # --- weight-generation fc stacks (generator.py:79-110) ---
        if self.adap_spade or self.adap_conv:
            sks2, eks2, cks2 = cfg.spade_ks ** 2, cfg.embed_ks ** 2, cfg.conv_ks ** 2
            fcs: Dict[str, Any] = {}
            for i in range(self.n_adaptive):
                ch_in, ch_out = ch[i], ch[i + 1]
                ch_h = self.hidden_ncs(i)[0]
                names_outs = []
                if self.adap_spade:
                    names_outs += [
                        ("fc_spade_0", (ch_h * sks2 + 1) * 2),
                        ("fc_spade_1", (ch_h * sks2 + 1) * (1 if ch_in != ch_out else 2)),
                        ("fc_spade_s", (ch_h * sks2 + 1) * 2),
                    ]
                    if self.adap_embed:
                        names_outs += [("fc_spade_e", ch_in * eks2 + 1)]
                if self.adap_conv:
                    names_outs += [
                        ("fc_conv_0", ch_out * cks2 + 1),
                        ("fc_conv_1", ch_in * cks2 + 1),
                        ("fc_conv_s", ch_out + 1),
                    ]
                for nm, fc_out in names_outs:
                    layers = [SNDense(ch_out, name=f"{nm}_{i}_l0")]
                    for k in range(1, cfg.n_fc_layers):
                        layers.append(SNDense(ch_out, name=f"{nm}_{i}_l{k}"))
                    layers.append(SNDense(fc_out, name=f"{nm}_{i}_out"))
                    fcs[f"{nm}_{i}"] = layers
            self.fcs = fcs

        # --- label embedding pyramid ---
        self.label_embedding = LabelEmbedder(
            arch=cfg.netS, nf=cfg.ngf, n_downsample=self.nd,
            params_free_layers=(self.n_adaptive if self.adap_embed else 0))

        # --- main branch ---
        # cfg.remat: rematerialize each up block in the backward pass
        # (jax.checkpoint) — trades ~1 recompute of the block for not
        # storing its full-res activations, the memory peak of training
        # (cf. reference's lack of any equivalent; enables pose bs4 @512x256
        # with VGG on a 16GB chip).  Param tree is unchanged.
        block_cls = (nn.remat(SpadeResnetBlock, static_argnums=(5, 6))
                     if cfg.remat_scope("blocks") else SpadeResnetBlock)
        self.up_blocks = [
            block_cls(
                ch[i + 1], ch[i], norm=norm, hidden_ncs=self.hidden_ncs(i),
                conv_ks=cfg.conv_ks, spade_ks=cfg.spade_ks,
                conv_params_free=(self.adap_conv and i < self.n_adaptive),
                norm_params_free=(self.adap_spade and i < self.n_adaptive),
                name=f"up_{i}")
            for i in range(self.nd + 1)
        ]
        # SNConv(use_sn=False) == the reference's plain conv with the same
        # {kernel, bias} param tree as nn.Conv, plus the STD apply modes
        self.conv_img = SNConv(3, 3, use_sn=False,
                               kernel_init=xavier_normal_init())

        # --- multi-reference attention (generator.py:127-134) ---
        if cfg.n_shot > 1:
            self.atn_query_first = SpadeConv2d(cfg.ngf, norm=norm_ref)
            self.atn_key_first = SpadeConv2d(cfg.ngf, norm=norm_ref)
            self.atn_key = [SpadeConv2d(ch[i + 1], norm=norm_ref, stride=2)
                            for i in range(cfg.n_downsample_A)]
            self.atn_query = [SpadeConv2d(ch[i + 1], norm=norm_ref, stride=2)
                              for i in range(cfg.n_downsample_A)]

        # --- VAE bottleneck (generator.py:137-144) ---
        if cfg.use_kld:
            self.z_dim = 256
            sw = cfg.fine_size // (2 ** self.nd)
            sh = int(sw / cfg.aspect_ratio)
            f_dim = min(1024, cfg.ngf * 2 ** self.nd) * sh * sw
            self.fc_mu_ref = nn.Dense(self.z_dim)
            self.fc_var_ref = nn.Dense(self.z_dim)
            self.fc_kld = nn.Dense(f_dim)

        # --- flow branches (generator.py:146-152) ---
        # The temporal branch is pre-created (gated by a call flag) instead of
        # the reference's mid-training architecture mutation
        # (init_temporal_network, generator.py:155-179).
        # Under cfg.remat the full-res flow nets / SC embedders are also
        # checkpointed — with the up blocks these are the activation-memory
        # peaks of the training backward (train arg is static: FlowGenerator
        # __call__ idx 4, LabelEmbedder idx 3).
        flow_cls = (nn.remat(FlowGenerator, static_argnums=(4,))
                    if cfg.remat_scope("flow") else FlowGenerator)
        embed_cls = (nn.remat(LabelEmbedder, static_argnums=(3,))
                     if cfg.remat_scope("embed") else LabelEmbedder)
        if self.warp_ref:
            self.flow_network_ref = flow_cls(cfg, 2)
            if cfg.spade_combine:
                self.img_ref_embedding = embed_cls(
                    arch=cfg.sc_arch, nf=cfg.ngf, n_downsample=self.nd,
                    spd_inference=cfg.spd_inference,
                    spd_train=cfg.spd_train)
        if not self.for_face and cfg.n_frames_G > 1:
            if not self.cfg.flow_temp_is_shared:
                self.flow_network_temp = flow_cls(cfg, cfg.n_frames_G)
            if cfg.spade_combine and not cfg.prev_embedding_is_shared:
                self.img_prev_embedding = embed_cls(
                    arch=cfg.sc_arch, nf=cfg.ngf, n_downsample=self.nd,
                    spd_inference=cfg.spd_inference,
                    spd_train=cfg.spd_train)

    # ------------------------------------------------------------------
    # attention (generator.py:291-316)
    # ------------------------------------------------------------------
    def _attention_encode(self, x, first, stack, train):
        x = first(x, train)
        for layer in stack:
            x = layer(x, train)
        return x

    def _attention_module(self, x, x_label, label, label_ref, train=False,
                          key=None):
        """Multi-reference spatial attention (generator.py:298-316), computed
        in query chunks with a streaming softmax so the (B, K*hw, hw) energy
        matrix is never materialized — at K=8, 512px the dense matrix is
        multi-GB and OOMs a single chip (the torch reference has the same
        blowup); chunked, memory is O(K*hw * chunk).

        x (and optionally x_label): (B*K, h, w, c) features to combine.
        key: precomputed reference-key encoding (K>1 eval cache) or None.
        Returns (out_x, out_label, atn_sum (B,K), atn_vis)."""
        bk, h, w, c = x.shape
        n = self.cfg.n_shot
        b = bk // n
        hw = h * w
        if key is None:
            key = self._attention_encode(label_ref, self.atn_key_first,
                                         self.atn_key, train)
        query = self._attention_encode(label, self.atn_query_first,
                                       self.atn_query, train)
        key = key.reshape(b, n * hw, c)
        query = query.reshape(b, hw, c)
        xf = x.reshape(b, n * hw, c)
        lf = (x_label.reshape(b, n * hw, c) if x_label is not None else None)

        # Pallas flash-attention fast path (eval only — the kernel is
        # forward-only; train/finetune keep the differentiable XLA path).
        # The energy matrix never touches HBM and the MXU runs in the input
        # dtype: measured >=2x on the K=8@512 bench vs the chunked path.
        use_flash = (not train and self.atn_flash != "off"
                     and self.cfg.use_pallas
                     and (self.atn_flash == "interpret"
                          or jax.default_backend() == "tpu")
                     and hw % 8 == 0 and c <= 512)
        if use_flash:
            from fsvid2vid_tpu.ops.pallas.attention_kernel import (
                flash_ref_attention)
            out_x, out_l, vis = flash_ref_attention(
                query, key, xf, lf, n_refs=n,
                interpret=(self.atn_flash == "interpret"))
            atn_sum = vis.sum(axis=1)                       # (b, n)
            out_x = out_x.reshape(b, h, w, c).astype(x.dtype)
            out_l = (out_l.reshape(b, h, w, c).astype(x.dtype)
                     if out_l is not None else None)
            atn_vis = vis.transpose(0, 2, 1).reshape(b, n, h, w)
            return out_x, out_l, atn_sum, atn_vis[-1:, 0:1]

        # largest power-of-two query chunk keeping the energy slab bounded
        q_chunk = hw
        while q_chunk > 1 and n * hw * q_chunk > self.atn_chunk_elems:
            q_chunk //= 2
        n_chunks = hw // q_chunk
        assert n_chunks * q_chunk == hw

        def one_chunk(q_c):
            energy = jnp.einsum("bnc,bqc->bnq", key.astype(jnp.float32),
                                q_c.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(energy, axis=1)
            out_x = jnp.einsum("bnc,bnq->bqc", xf.astype(jnp.float32), attn,
                               preferred_element_type=jnp.float32)
            out_l = (jnp.einsum("bnc,bnq->bqc", lf.astype(jnp.float32), attn,
                                preferred_element_type=jnp.float32)
                     if lf is not None else jnp.zeros_like(out_x))
            a4 = attn.reshape(b, n, hw, -1)
            return (out_x, out_l, a4.sum((2, 3)), a4.sum(2))

        if n_chunks == 1:
            out_x, out_l, atn_sum, atn_vis_flat = one_chunk(query)
        else:
            q_chunks = query.reshape(b, n_chunks, q_chunk, c).transpose(1, 0, 2, 3)
            out_x, out_l, atn_sums, atn_vis_c = jax.lax.map(one_chunk, q_chunks)
            out_x = out_x.transpose(1, 0, 2, 3).reshape(b, hw, -1)
            out_l = out_l.transpose(1, 0, 2, 3).reshape(b, hw, -1)
            atn_sum = atn_sums.sum(0)
            atn_vis_flat = atn_vis_c.transpose(1, 2, 0, 3).reshape(b, n, hw)

        out_x = out_x.reshape(b, h, w, c).astype(x.dtype)
        out_l = (out_l.reshape(b, h, w, c).astype(x.dtype)
                 if lf is not None else None)
        atn_vis = atn_vis_flat.reshape(b, n, h, w)
        return out_x, out_l, atn_sum, atn_vis[-1:, 0:1]

    # ------------------------------------------------------------------
    # reference encoding (generator.py:341-393)
    # ------------------------------------------------------------------
    def _ref_encode_prefix(self, img_ref, label_ref, train):
        """Label-independent part of the reference encoding: first convs +
        downs up to the attention point, and the attention keys.  At eval
        with K>1 this is the bulk of the per-frame cost and can be computed
        once per clip (encode_reference_multi) — the torch reference re-runs
        it every frame (generator.py:354-357)."""
        if self.concat_label_ref:
            x = self.ref_img_first(
                jnp.concatenate([img_ref, label_ref], axis=-1), train)
            x_label = None
        else:
            x = self.ref_img_first(img_ref, train)
            x_label = self.ref_label_first(label_ref, train)
        n_pre = (min(self.cfg.n_downsample_A, self.nd)
                 if self.cfg.n_shot > 1 else 0)
        for i in range(n_pre):
            x = self.ref_img_down[i](x, train)
            if self.mul_label_ref:
                x_label = self.ref_label_down[i](x_label, train)
        key = None
        if self.cfg.n_shot > 1 and 1 <= self.cfg.n_downsample_A <= self.nd:
            key = self._attention_encode(label_ref, self.atn_key_first,
                                         self.atn_key, train)
        return dict(x=x, x_label=x_label, key=key)

    def _reference_encoding(self, img_ref, label_ref, label, need_encoded_ref,
                            train, prefix=None):
        """img_ref/label_ref flattened to (B*K, H, W, C).  prefix: cached
        _ref_encode_prefix output (K>1 eval fast path) or None."""
        cfg = self.cfg
        n = cfg.n_shot
        if prefix is None:
            prefix = self._ref_encode_prefix(img_ref, label_ref, train)
        x, x_label, key = prefix["x"], prefix["x_label"], prefix["key"]

        atn = atn_vis = ref_idx = None
        if n > 1 and 1 <= cfg.n_downsample_A <= self.nd:
            x, x_label_atn, atn_sum, atn_vis = self._attention_module(
                x, x_label if self.mul_label_ref else None,
                label, label_ref, train=train, key=key)
            if self.mul_label_ref:
                x_label = x_label_atn
            atn = atn_sum  # per-reference attention mass
            ref_idx = jnp.argmax(atn_sum, axis=1)
        n_pre = min(cfg.n_downsample_A, self.nd) if n > 1 else 0
        for i in range(n_pre, self.nd):
            x = self.ref_img_down[i](x, train)
            if self.mul_label_ref:
                x_label = self.ref_label_down[i](x_label, train)

        encoded_ref = None
        if need_encoded_ref:
            enc_img = [x]
            enc_label = [x_label] if self.mul_label_ref else None
            for i in reversed(range(self.nd)):
                enc_img.append(self.ref_img_up[i](enc_img[-1], train))
                if self.mul_label_ref:
                    enc_label.append(self.ref_label_up[i](enc_label[-1], train))
            if self.mul_label_ref:
                encoded_ref = []
                for conv, conv_label in zip(enc_img, enc_label):
                    sm = jax.nn.softmax(conv_label, axis=-1)
                    # (b, i, j) = sum_hw conv[...i] * softmax(label)[...j]
                    prod = jnp.einsum("bhwi,bhwj->bij",
                                      conv.astype(jnp.float32),
                                      sm.astype(jnp.float32),
                                      preferred_element_type=jnp.float32)
                    encoded_ref.append(prod.astype(conv.dtype))
            else:
                encoded_ref = enc_img
            encoded_ref = encoded_ref[::-1]
        return x, encoded_ref, atn, atn_vis, ref_idx

    # ------------------------------------------------------------------
    # fc -> generated weights, reproducing torch flat-split order
    # ------------------------------------------------------------------
    def _run_fc(self, name, i, feat, train):
        """feat: (B, C, C) mul-path outer product or (B, h, w, C) features.

        Returns flat (B, rows * fc_out) matching torch fc(x).view(b, -1)."""
        if self.mul_label_ref:
            b, rows, c = feat.shape
            x = feat.reshape(b * rows, c)
        else:
            pooled = adaptive_avg_pool(feat, (32, 32))   # sh_fix x sw_fix
            b, h, w, c = pooled.shape
            rows = c
            x = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(b * c, h * w)
        layers = self.fcs[f"{name}_{i}"]
        for layer in layers[:-1]:
            x = leaky_relu(layer(x, train))
        x = layers[-1](x, train)
        return x.reshape(b, -1)

    def _get_spade_weights(self, feat, i, train):
        """Generated SPADE mlp + embedding weights for layer i
        (generator.py:245-273).  Reproduces the torch flat split order: the fc
        output (b, rows*fc_out) is halved into gamma/beta chunks, each chunk's
        last `cout` elements form the (unused-by-SPADE) bias."""
        cfg = self.cfg
        ch_in, ch_out = self.ch[i], self.ch[i + 1]
        ch_h = self.hidden_ncs(i)[0]
        sks, eks = cfg.spade_ks, cfg.embed_ks

        embedding_weights = None
        if self.adap_embed:
            fc_e = self._run_fc("fc_spade_e", i, feat, train)[:, :-ch_in]
            if ch_in != ch_out:
                embedding_weights = self._flat_to_conv_sized(
                    fc_e, ch_in, ch_out, eks)
            else:  # torch reshape_weight falls into its no-bias branch here
                b = fc_e.shape[0]
                w = fc_e.reshape(b, ch_in, ch_out, eks, eks)
                embedding_weights = (jnp.transpose(w, (0, 3, 4, 2, 1)), None)

        def pair(flat):
            half = flat.shape[1] // 2
            return flat[:, :half], flat[:, half:]

        def to_conv_nobias(flat, cout):
            b = flat.shape[0]
            w = flat[:, :-cout].reshape(b, cout, ch_h, sks, sks)
            return jnp.transpose(w, (0, 3, 4, 2, 1))

        g0, b0 = pair(self._run_fc("fc_spade_0", i, feat, train))
        g1, b1 = pair(self._run_fc("fc_spade_1", i, feat, train))
        gs, bs = pair(self._run_fc("fc_spade_s", i, feat, train))
        weight_0 = (to_conv_nobias(g0, ch_out), to_conv_nobias(b0, ch_out))
        weight_1 = (to_conv_nobias(g1, ch_in), to_conv_nobias(b1, ch_in))
        weight_s = (to_conv_nobias(gs, ch_out), to_conv_nobias(bs, ch_out))
        return embedding_weights, [weight_0, weight_1, weight_s]

    @staticmethod
    def _flat_to_conv_sized(flat, cout, cin, k):
        b = flat.shape[0]
        w = flat[:, :-cout].reshape(b, cout, cin, k, k)
        bias = flat[:, -cout:]
        return jnp.transpose(w, (0, 3, 4, 2, 1)), bias

    def _get_conv_weights(self, feat, i, train):
        """Generated main-branch conv weights (generator.py:276-289).

        Deviation from the reference (documented): the torch code's shapes are
        self-inconsistent for the default mul_label_ref path (fc_in mismatch,
        bias sized with the wrong channel count) and adaptive_conv is unused by
        every shipped script; here weights are generated with self-consistent
        shapes: conv_0 (fin->fhidden), conv_1 (fhidden->fout), conv_s 1x1."""
        ch_in, ch_out = self.ch[i], self.ch[i + 1]
        k = self.cfg.conv_ks
        fc_0 = self._run_fc("fc_conv_0", i, feat, train)
        fc_1 = self._run_fc("fc_conv_1", i, feat, train)
        fc_s = self._run_fc("fc_conv_s", i, feat, train)
        rows = fc_0.shape[1] // (ch_out * k * k + 1)
        w0 = self._flat_to_conv_sized(fc_0[:, :rows * (ch_out * k * k + 1)]
                                      .reshape(fc_0.shape[0], -1),
                                      ch_in, ch_out, k)
        w1 = self._flat_to_conv_sized(fc_1, ch_in, ch_in, k)
        ws = self._flat_to_conv_sized(fc_s, ch_in, ch_out, 1)
        return [w0, w1, ws]

    # ------------------------------------------------------------------
    # VAE bottleneck (generator.py:319-338)
    # ------------------------------------------------------------------
    def _compute_kld(self, x, label, img_coarse, train):
        mu = logvar = None
        if img_coarse is not None:
            if self.concat_label_ref:
                img_coarse = jnp.concatenate([img_coarse, label], axis=-1)
            xk = self.ref_img_first(img_coarse, train)
            for i in range(self.nd):
                xk = self.ref_img_down[i](xk, train)
            return xk, mu, logvar
        if self.cfg.use_kld:
            b = x.shape[0]
            mu = self.fc_mu_ref(x.reshape(b, -1))
            if train:
                logvar = self.fc_var_ref(x.reshape(b, -1))
                eps = jax.random.normal(self.make_rng("vae"), mu.shape)
                z = eps * jnp.exp(0.5 * logvar) + mu
            else:
                z = mu
            xk = self.fc_kld(z).reshape(x.shape)
            return xk, mu, logvar
        return x, mu, logvar

    # ------------------------------------------------------------------
    # weight generation (generator.py:396-422)
    # ------------------------------------------------------------------
    def weight_generation(self, img_refs, label_refs, label, img_coarse=None,
                          train=False, prefix=None):
        """img_refs/label_refs: (B, K, H, W, C).

        Returns (x_kld, gen) where gen = dict(embedding_weights, norm_weights,
        conv_weights, atn, atn_vis, ref_idx, mu, logvar)."""
        b, k = img_refs.shape[:2]
        img_flat = img_refs.reshape((b * k,) + img_refs.shape[2:])
        label_flat = label_refs.reshape((b * k,) + label_refs.shape[2:])
        x, encoded_ref, atn, atn_vis, ref_idx = self._reference_encoding(
            img_flat, label_flat, label, need_encoded_ref=True, train=train,
            prefix=prefix)
        x_kld, mu, logvar = self._compute_kld(x, label, img_coarse, train)

        embedding_weights, norm_weights, conv_weights = [], [], []
        for i in range(self.n_adaptive):
            if self.adap_spade:
                feat = encoded_ref[min(len(encoded_ref) - 1, i + 1)]
                ew, nw = self._get_spade_weights(feat, i, train)
                embedding_weights.append(ew)
                norm_weights.append(nw)
            if self.adap_conv:
                feat = encoded_ref[min(len(encoded_ref) - 1, i)]
                conv_weights.append(self._get_conv_weights(feat, i, train))
        gen = dict(embedding_weights=embedding_weights,
                   norm_weights=norm_weights, conv_weights=conv_weights,
                   atn=atn, atn_vis=atn_vis, ref_idx=ref_idx,
                   mu=mu, logvar=logvar)
        return x_kld, gen

    # ------------------------------------------------------------------
    # flow (generator.py:424-445)
    # ------------------------------------------------------------------
    def flow_generation(self, label, label_refs, img_refs, prev_label,
                        prev_img, ref_idx, warp_prev, train):
        label_ref = pick_ref(label_refs, ref_idx)
        img_ref = pick_ref(img_refs, ref_idx)
        flow, flow_mask, img_warp, ds_ref = ([None, None] for _ in range(4))
        do_prev = warp_prev and prev_label is not None
        if (self.warp_ref and do_prev and self.cfg.flow_temp_is_shared
                and not train):
            # Shared flow net at eval: the ref and prev estimations are the
            # same network on same-shaped inputs (n_frames_G == 2) — run them
            # as one 2B-batch invocation + one batched warp (halves the
            # flow-branch launches; eval norms use running stats so the
            # result is identical to two separate calls).
            b = label.shape[0]
            flow2, mask2 = self.flow_network_ref(
                jnp.concatenate([label, label], 0),
                jnp.concatenate([label_ref, prev_label], 0),
                jnp.concatenate([img_ref, prev_img], 0), False)
            warp2 = flow_warp(
                jnp.concatenate([img_ref[..., :3], prev_img[..., -3:]], 0),
                flow2)
            flow = [flow2[:b], flow2[b:]]
            flow_mask = [mask2[:b], mask2[b:]]
            img_warp = [warp2[:b], warp2[b:]]
        else:
            if self.warp_ref:
                flow_ref, mask_ref = self.flow_network_ref(
                    label, label_ref, img_ref, train)
                img_ref_warp = flow_warp(img_ref, flow_ref)
                flow[0], flow_mask[0] = flow_ref, mask_ref
                img_warp[0] = img_ref_warp[..., :3]
            if do_prev:
                flow_net = (self.flow_network_ref
                            if self.cfg.flow_temp_is_shared
                            else self.flow_network_temp)
                flow_prev, mask_prev = flow_net(
                    label, prev_label, prev_img, train)
                img_prev_warp = flow_warp(prev_img[..., -3:], flow_prev)
                flow[1], flow_mask[1], img_warp[1] = (flow_prev, mask_prev,
                                                      img_prev_warp)
        if self.cfg.spade_combine:
            if self.warp_ref:
                ds_ref[0] = jnp.concatenate([img_warp[0], flow_mask[0]], axis=-1)
            if warp_prev and prev_label is not None:
                ds_ref[1] = jnp.concatenate([img_warp[1], flow_mask[1]], axis=-1)
        return flow, flow_mask, img_warp, ds_ref

    def _spade_combine(self, encoded_label, ds_ref, train):
        """Attach warped-image embeddings as extra SPADE maps
        (generator.py:448-454)."""
        if not self.cfg.spade_combine:
            return encoded_label
        if (self.cfg.prev_embedding_is_shared
                and ds_ref[0] is not None and ds_ref[1] is not None):
            # Shared embedder: run the ref and prev pyramids as one 2B-batch
            # call.  Exact in BOTH modes — the embedder is norm-free plain
            # convs (embedder.py), so conv(concat(a,b)) == concat(conv(a),
            # conv(b)) for forward and parameter gradients alike.
            b = ds_ref[0].shape[0]
            both = self.img_ref_embedding(
                jnp.concatenate([ds_ref[0], ds_ref[1]], axis=0), None, train)
            enc_ref = [e[:b] for e in both]
            enc_prev = [e[b:] for e in both]
            out = list(encoded_label)
            for i in range(self.cfg.n_sc_layers):
                out[i] = [encoded_label[i], enc_ref[i], enc_prev[i]]
            return out
        enc_ref = (self.img_ref_embedding(ds_ref[0], None, train)
                   if ds_ref[0] is not None else None)
        if ds_ref[1] is not None:
            prev_embed = (self.img_ref_embedding
                          if self.cfg.prev_embedding_is_shared
                          else self.img_prev_embedding)
            enc_prev = prev_embed(ds_ref[1], None, train)
        else:
            enc_prev = None
        out = list(encoded_label)
        for i in range(self.cfg.n_sc_layers):
            out[i] = [encoded_label[i],
                      enc_ref[i] if enc_ref is not None else None,
                      enc_prev[i] if enc_prev is not None else None]
        return out

    # ------------------------------------------------------------------
    # main branch (generator.py:199-211)
    # ------------------------------------------------------------------
    def _std_levels(self, encoded_label, train) -> int:
        """Number of finest up-block levels to run in space-to-depth layout
        (0 = disabled).  The two finest levels are the small-channel full-res
        stages whose NHWC tensors waste most of the 128-wide vector lanes
        (ops/spd.py); the STD math is exact.  Train mode rides cfg.spd_train
        (round 5): SyncBatchNorm reduces batch stats over the phase dim and
        SNConv spectral-normalizes the pre-scatter kernel, so forward, stat
        updates, and gradients match the plain layout (tests/test_spd.py)."""
        cfg = self.cfg
        if ((train and not cfg.spd_train) or not cfg.spd_inference
                or self.nd < 2
                or cfg.spade_ks != 1 or cfg.conv_ks != 3 or self.adap_conv
                or "batch" not in cfg.norm_G):
            return 0
        m = encoded_label[0]
        m = m[0] if isinstance(m, list) else m
        if m.shape[1] % 4 or m.shape[2] % 4:
            return 0
        return 2

    def _main_branch(self, x, encoded_label, gen, raw_label=None, train=False):
        cfg = self.cfg
        add_raw = cfg.add_raw_output_loss and cfg.spade_combine
        x_raw = None
        n_std = self._std_levels(encoded_label, train)

        def weights_for(i):
            cw = (gen["conv_weights"][i]
                  if self.adap_conv and i < self.n_adaptive else None)
            nw = (gen["norm_weights"][i]
                  if self.adap_spade and i < self.n_adaptive else None)
            return cw, nw

        for i in range(self.nd, n_std - 1, -1):
            cw, nw = weights_for(i)
            if add_raw and i < cfg.n_sc_layers:
                if i == cfg.n_sc_layers - 1:
                    x_raw = x
                x_raw = self.up_blocks[i](x_raw, raw_label[i], cw, nw,
                                          train, False)
                if i > n_std:
                    x_raw = upsample_nearest(x_raw)
            x = self.up_blocks[i](x, encoded_label[i], cw, nw, train, False)
            if i > n_std:
                x = upsample_nearest(x)

        if n_std:
            def to_std(lbl):
                if isinstance(lbl, list):
                    return [space_to_depth(m) if m is not None else None
                            for m in lbl]
                return space_to_depth(lbl)

            # the 2x nearest upsample entering the STD region is a channel
            # tiling of the pre-upsample tensor (spd_upsample_enter)
            x = spd_upsample_enter(x)
            if x_raw is not None:
                x_raw = spd_upsample_enter(x_raw)
            for i in range(n_std - 1, -1, -1):
                cw, nw = weights_for(i)
                if add_raw and i < cfg.n_sc_layers:
                    if i == cfg.n_sc_layers - 1:
                        x_raw = x
                    x_raw = self.up_blocks[i](x_raw, to_std(raw_label[i]),
                                              cw, nw, train, True)
                    if i != 0:
                        x_raw = spd_upsample_enter(depth_to_space(x_raw))
                x = self.up_blocks[i](x, to_std(encoded_label[i]), cw, nw,
                                      train, True)
                if i != 0:
                    x = spd_upsample_enter(depth_to_space(x))
            img = depth_to_space(jnp.tanh(
                self.conv_img(leaky_relu(x), train, spd="s1")))
            img_raw = (depth_to_space(jnp.tanh(
                self.conv_img(leaky_relu(x_raw), train, spd="s1")))
                if x_raw is not None else None)
            return img, img_raw

        img = jnp.tanh(self.conv_img(leaky_relu(x), train))
        img_raw = (jnp.tanh(self.conv_img(leaky_relu(x_raw), train))
                   if x_raw is not None else None)
        return img, img_raw

    # ------------------------------------------------------------------
    # public entry points
    # ------------------------------------------------------------------
    def __call__(self, label, label_refs, img_refs, prev_label=None,
                 prev_img=None, warp_prev: bool = False, train: bool = False,
                 prefix=None):
        """Full forward (generator.py:181-229).

        label: (B,H,W,Cl); label_refs/img_refs: (B,K,H,W,C);
        prev_label/prev_img: (B,H,W,(n_frames_G-1)*C) stacked previous frames
        or None; warp_prev: static flag — the temporal phase
        (init_temporal_network) is a call-time gate here.
        prefix: cached encode_reference_multi output (K>1 eval fast path).

        Returns dict with img_final, flow, flow_mask, img_raw, img_warp, mu,
        logvar, atn_vis, ref_idx.
        """
        cfg = self.cfg
        x, gen = self.weight_generation(img_refs, label_refs, label,
                                        train=train, prefix=prefix)
        encoded_label = self.label_embedding(
            label, weights=(gen["embedding_weights"] if self.adap_embed else None),
            train=train)

        flow, flow_mask, img_warp, ds_ref = self.flow_generation(
            label, label_refs, img_refs, prev_label, prev_img,
            gen["ref_idx"], warp_prev, train)

        raw_label = None
        if cfg.add_raw_output_loss and cfg.spade_combine:
            raw_label = [encoded_label[i] for i in range(cfg.n_sc_layers)]
        encoded_label = self._spade_combine(encoded_label, ds_ref, train)

        img_final, img_raw = self._main_branch(x, encoded_label, gen,
                                               raw_label, train)

        if not cfg.spade_combine:
            if self.warp_ref:
                img_raw_out = img_final
                img_final = (img_final * flow_mask[0]
                             + img_warp[0] * (1 - flow_mask[0]))
            else:
                img_raw_out = img_final if warp_prev else None
            if warp_prev and prev_label is not None:
                img_final = (img_final * flow_mask[1]
                             + img_warp[1] * (1 - flow_mask[1]))
            img_raw = img_raw_out
        return dict(img_final=img_final, flow=flow, flow_mask=flow_mask,
                    img_raw=img_raw, img_warp=img_warp, mu=gen["mu"],
                    logvar=gen["logvar"], atn_vis=gen["atn_vis"],
                    ref_idx=gen["ref_idx"])

    def forward_face(self, label, label_refs, img_refs, img_coarse,
                     train: bool = False):
        """Face refinement forward (generator.py:232-242): encode the coarse
        result as the bottleneck, modulate with the face-crop label."""
        x, gen = self.weight_generation(img_refs, label_refs, label,
                                        img_coarse=img_coarse, train=train)
        encoded_label = self.label_embedding(
            label, weights=(gen["embedding_weights"] if self.adap_embed else None),
            train=train)
        for i in range(self.nd, -1, -1):
            nw = (gen["norm_weights"][i]
                  if self.adap_spade and i < self.n_adaptive else None)
            x = self.up_blocks[i](x, encoded_label[i], None, nw, train, False)
            if i != 0:
                x = upsample_nearest(x)
        return jnp.tanh(self.conv_img(leaky_relu(x)))

    # ---- inference fast path: encode references once (n_shot == 1) ----
    def encode_reference(self, label_refs, img_refs, label):
        """Compute the reference cache once at t=0 (replaces the attribute
        caching at generator.py:415-418).  Valid for n_shot == 1 where neither
        the bottleneck nor the generated weights depend on the current label."""
        x, gen = self.weight_generation(img_refs, label_refs, label,
                                        train=False)
        return dict(x_kld=x, embedding_weights=gen["embedding_weights"],
                    norm_weights=gen["norm_weights"],
                    conv_weights=gen["conv_weights"])

    def encode_reference_multi(self, label_refs, img_refs):
        """K>1 eval cache: per-reference encoder features up to the attention
        point + attention keys (all label-independent).  The per-frame
        forward then only runs the query encode, the attention mix, and the
        post-attention encoder tail — pass the result as `prefix` to
        __call__.  The torch reference recomputes the whole K-reference
        encoder every frame (generator.py:354-357, 403)."""
        b, k = img_refs.shape[:2]
        img_flat = img_refs.reshape((b * k,) + img_refs.shape[2:])
        label_flat = label_refs.reshape((b * k,) + label_refs.shape[2:])
        return self._ref_encode_prefix(img_flat, label_flat, False)

    def synthesize(self, label, label_refs, img_refs, cache, prev_label=None,
                   prev_img=None, warp_prev: bool = False):
        """Per-frame inference using a precomputed reference cache."""
        cfg = self.cfg
        gen = dict(embedding_weights=cache["embedding_weights"],
                   norm_weights=cache["norm_weights"],
                   conv_weights=cache["conv_weights"],
                   atn=None, atn_vis=None, ref_idx=None, mu=None, logvar=None)
        encoded_label = self.label_embedding(
            label, weights=(gen["embedding_weights"] if self.adap_embed else None),
            train=False)
        flow, flow_mask, img_warp, ds_ref = self.flow_generation(
            label, label_refs, img_refs, prev_label, prev_img, None,
            warp_prev, False)
        raw_label = None
        if cfg.add_raw_output_loss and cfg.spade_combine:
            raw_label = [encoded_label[i] for i in range(cfg.n_sc_layers)]
        encoded_label = self._spade_combine(encoded_label, ds_ref, False)
        img_final, img_raw = self._main_branch(cache["x_kld"], encoded_label,
                                               gen, raw_label, False)
        if not cfg.spade_combine:
            if self.warp_ref:
                img_final = (img_final * flow_mask[0]
                             + img_warp[0] * (1 - flow_mask[0]))
            if warp_prev and prev_label is not None:
                img_final = (img_final * flow_mask[1]
                             + img_warp[1] * (1 - flow_mask[1]))
        return dict(img_final=img_final, flow=flow, flow_mask=flow_mask,
                    img_raw=img_raw, img_warp=img_warp)

