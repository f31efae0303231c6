"""Decode roofline: analytic bytes/FLOPs accounting of the flagship
beam-5 batch vs TPU v5e hardware limits (VERDICT r3 task 4).

Answers, with arithmetic shown, where the measured decode sits against
the chip's memory and compute rooflines:

* what fraction of the HBM-bandwidth roofline the measured 41 ms
  64-image batch achieves;
* where the ~23.6 ms fused-kernel cache-scan floor sits against its
  pure DMA time (and an estimated VPU bound for its in-VMEM compute).

Everything is closed-form from the flagship shapes (bench.py
``build_flagship``: CLIP ViT-B/32 + GPT-2 768/12L, vocab 50257, batch 64,
beam 5, max_length 20, prefix 10) and public TPU v5e specs; the measured
milliseconds are the chained steady-state figures from
docs/performance.md. Run ``python scripts/roofline.py`` to regenerate the
table in docs/performance.md ("Decode roofline").

Reference context being measured against: the reference's modern decode
re-ran the full prefix per token with no KV cache at all
(src/models/decoders.py:461-491), so its roofline fraction was ~0; this
analysis is about how far OUR kernel path sits from speed-of-light.
"""

# ---- flagship decode shapes (bench.py build_flagship(on_tpu=True)) ----
B = 64          # images per batch
K = 5           # beam width
R = B * K       # beam rows
H = 768         # GPT-2 hidden
NH = 12         # heads
LAYERS = 12
V = 50257       # vocab (logits width)
L = 20          # max_length -> L-1 scanned decode steps
STEPS = L - 1
S = -(-L // 8) * 8           # suffix cache alloc, 8-aligned (gpt2.init_cache)
P = 10                       # prefix length
P8 = -(-P // 8) * 8          # kernel pads the prefix axis to 8
MLP = 4 * H
BF16 = 2                     # bytes
F32 = 4

# ---- TPU v5e (public specs; one chip = one TensorCore) ----
HBM_BW = 819e9               # bytes/s
MXU_BF16 = 197e12            # FLOP/s
# VPU: 8 sublanes x 128 lanes x 4 ALUs ~= 4096 lanes; clock ~= MXU peak /
# (4 MXUs * 128*128 MACs * 2) ~= 1.5e14/1.31e5 = ~1.5 GHz -> ~6e12 op/s.
# Treat as +-50%: it only needs to separate "VPU-bound" from "DMA-bound".
VPU_OPS = 6e12

# ---- measured (docs/performance.md, chained steady-state on the chip) ----
MEAS_BATCH_MS = 41.2         # whole bench batch (1555 img/s headline)
MEAS_ENCODER_MS = 7.6        # encoder + out-of-loop (round-1 profile delta)
MEAS_SCAN_MS = 23.6          # 19-step x 12-layer fused cache scan, ablated


def gib(x):
    return x / 1e9


def main():
    # ---------------- per-step HBM bytes ----------------
    # 1. GPT-2 backbone weights (bf16 pre-cast), streamed once per step:
    per_layer_params = H * 3 * H + H * H + 2 * H * MLP   # qkv, proj, mlp
    w_backbone = LAYERS * per_layer_params * BF16
    # 2. logits head weight [H, V] bf16:
    w_logits = H * V * BF16
    # 3. fused decode kernel per layer:
    #    - suffix K+V cache load, all S rows (full-cache load measured
    #      faster than chunked: performance.md round-3 drain section)
    kv_load = 2 * R * S * H * BF16
    #    - shared prefix K+V load
    pre_load = 2 * B * P * H * BF16
    #    - append put: Mosaic DMA on the tiled position axis is 8-row
    #      aligned, so each step writes an 8-row window, not 1 row
    kv_put = 2 * R * 8 * H * BF16
    kernel_bytes = LAYERS * (kv_load + pre_load + kv_put)
    # 4. logits activations: [R, V] bf16 written by the matmul, read once
    #    by the fused top-k (ops/topk.fused_beam_top_k reads bf16 directly)
    act_logits = 2 * R * V * BF16
    step_bytes = w_backbone + w_logits + kernel_bytes + act_logits
    batch_bytes = STEPS * step_bytes

    # ---------------- per-step MXU FLOPs ----------------
    f_backbone = LAYERS * 2 * R * per_layer_params
    f_logits = 2 * R * H * V
    # kernel head-mask dots: score + value passes over (S + P8 + 1) pos
    f_kernel = LAYERS * 2 * 2 * R * (S + P8 + 1) * H
    step_flops = f_backbone + f_logits + f_kernel
    batch_flops = STEPS * step_flops

    # ---------------- kernel-only accounting ----------------
    scan_bytes = STEPS * kernel_bytes
    scan_dma_ms = scan_bytes / HBM_BW * 1e3
    # in-VMEM VPU work per layer-step (ops/pallas_decode._kernel):
    #   K ancestry select passes over the K and V blocks
    vpu_sel = 2 * K * R * S * H
    #   f32 score products (suffix + prefix) and value multiplies + adds
    vpu_mul = 2 * (R * S * H + R * P8 * H)
    vpu_add = R * S * H + R * P8 * H
    vpu_ops = STEPS * LAYERS * (vpu_sel + vpu_mul + vpu_add)
    scan_vpu_ms = vpu_ops / VPU_OPS * 1e3

    # ---------------- decode-loop / whole-batch ----------------
    loop_ms = MEAS_BATCH_MS - MEAS_ENCODER_MS
    hbm_floor_ms = batch_bytes / HBM_BW * 1e3
    mxu_floor_ms = batch_flops / MXU_BF16 * 1e3
    ai = batch_flops / batch_bytes
    ridge = MXU_BF16 / HBM_BW

    print("== flagship decode roofline (B=64, K=5, 19 steps, v5e) ==")
    print(f"shapes: R={R} rows, S={S} cache, P={P} (pad {P8}), "
          f"H={H}, V={V}, {LAYERS} layers")
    print()
    print("-- per 64-image batch (19 scanned steps) --")
    print(f"backbone weights : {gib(STEPS * w_backbone):6.2f} GB")
    print(f"logits weight    : {gib(STEPS * w_logits):6.2f} GB")
    print(f"kernel KV traffic: {gib(scan_bytes):6.2f} GB "
          f"(load {gib(STEPS * LAYERS * kv_load):.2f} + prefix "
          f"{gib(STEPS * LAYERS * pre_load):.2f} + 8-row puts "
          f"{gib(STEPS * LAYERS * kv_put):.2f})")
    print(f"logits activation: {gib(STEPS * act_logits):6.2f} GB")
    print(f"TOTAL HBM bytes  : {gib(batch_bytes):6.2f} GB "
          f"-> DMA floor {hbm_floor_ms:.1f} ms @ 819 GB/s")
    print(f"TOTAL MXU FLOPs  : {batch_flops / 1e12:6.2f} TFLOP "
          f"-> MXU floor {mxu_floor_ms:.1f} ms @ 197 TFLOP/s")
    print(f"arithmetic intensity {ai:.0f} FLOP/byte vs ridge {ridge:.0f} "
          f"-> memory-bound")
    print()
    print(f"measured decode loop {loop_ms:.1f} ms "
          f"(batch {MEAS_BATCH_MS} - encoder {MEAS_ENCODER_MS}) "
          f"= {hbm_floor_ms / loop_ms * 100:.0f}% of the HBM roofline")
    print()
    print("-- fused cache scan only (228 kernel calls/batch) --")
    per_call_bytes = kernel_bytes / LAYERS
    n_calls = STEPS * LAYERS
    print(f"bytes/call {per_call_bytes / 1e6:.1f} MB -> DMA "
          f"{per_call_bytes / HBM_BW * 1e6:.0f} us; measured "
          f"{MEAS_SCAN_MS / n_calls * 1e3:.0f} us/call")
    print(f"scan DMA floor  : {scan_dma_ms:.1f} ms")
    print(f"scan VPU est.   : {scan_vpu_ms:.1f} ms "
          f"({vpu_ops / 1e9:.1f}G ops @ ~{VPU_OPS / 1e12:.0f}T/s)")
    print(f"scan measured   : {MEAS_SCAN_MS:.1f} ms = "
          f"{MEAS_SCAN_MS / scan_dma_ms:.2f}x its pure-DMA time")
    print()
    print(f"headline implied if scan ran at DMA floor: "
          f"{B / ((MEAS_BATCH_MS - MEAS_SCAN_MS + scan_dma_ms) / 1e3):.0f} "
          f"img/s (vs measured {B / (MEAS_BATCH_MS / 1e3):.0f})")


if __name__ == "__main__":
    main()
