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
    # forward defaults (the for_shape table below picks measured configs
    # per shape; 1024x1024 is the safe generic grid — wide one-shot blocks
    # need block_kv_inner to keep the fp32 score tile in VMEM)
    block_q: int = 1024
    block_kv: int = 1024
    # inner sub-tile of block_kv processed per online-softmax update (None =
    # whole block); lets the next sub-tile's MXU work overlap this one's VPU
    block_kv_inner: int | None = None
    # q-row stripe width for the static causal-diagonal specialization
    # (flash_fwd diag_static): under plain causal with square blocks, the
    # diagonal blocks unroll as (block_q_inner)^2 tiles covering only the
    # live triangle. None = off. Interior blocks never stripe.
    block_q_inner: int | None = None
    # heads packed per fwd grid step (amortizes the ~1.5 us fixed
    # per-grid-step cost — decisive when seqlen <= block and each (b, h)
    # cell is a single tiny step); must cover whole GQA groups, snapped in
    # the wrapper
    block_h: int = 1
    # backward dq kernel: q-block rows owned per grid cell, kv streamed
    block_q_dq: int = 1024
    block_kv_dq: int = 1024
    # inner kv sub-tile of the dq sweep (None = whole block); bounds the
    # fp32 score tile so block_kv_dq can grow to the whole sequence (the
    # one-shot regime — see flash_fwd)
    block_kv_dq_inner: int | None = None
    # backward dkv kernel: kv-block cols owned per grid cell, q streamed
    block_q_dkv: int = 1024
    block_kv_dkv: int = 1024
    # inner q sub-tile of the dkv sweep (mirror of block_kv_dq_inner)
    block_q_dkv_inner: int | None = None

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
                  causal: bool = False, segmented: bool = False,
                  ) -> "BlockSizes":
        """Pick block sizes for a given problem shape.

        The analogue of the per-head_dim tile tables in the reference launch
        templates (hdim128 -> 128x64, hdim64 -> 128x128 there). Forward table
        measured on a TPU v5e at B=4 H=32 D=128 bf16 (tools/tune_r5*.py,
        round 5); the decisive structure is the ONE-SHOT regime: when the
        whole K/V sequence fits one block (block_kv = sk), the online-softmax
        state stays in SSA (no VMEM scratch, no cross-step reduction dim) and
        K/V stream through block_kv_inner-wide sub-tiles — measured 84-89%
        SOL at seq 2k-8k dense vs 65-71% for the classic square-block grid.
        Above 8k the K/V block no longer fits VMEM and the grid path returns
        with the widest block that compiles, (1024, 2048, inner 1024) -> 75%.

        Causal wants two specializations on top: the static diagonal
        triangle at one-cell shapes (block_q_inner, flash_fwd diag_static:
        2048^2 blocks with 256-row stripes measure 67% SOL at 2k causal vs
        39% for the square grid), and the one-shot BAND SWITCH at 4k-8k
        (flash_fwd._band_branch: a lax.switch over static per-band live
        kv sub-ranges — 8k causal 74% vs 56%). Neither helps the
        multi-block scratch regime (measured), so 16k+ causal keeps the
        plain grid.

        Head packing (block_h > 1) measured a loss at every seqlen (round 3);
        the segmented (varlen) path keeps the plain clamped-1024 table —
        its live ranges are data-dependent, so the one-shot/triangle
        structure does not apply.
        """

        def clamp(block, seqlen):
            # Don't use a block larger than the padded sequence.
            while block > MIN_BLOCK and block >= 2 * seqlen:
                block //= 2
            return max(block, MIN_BLOCK)

        def pick_inner(bkv: int, target: int) -> int | None:
            """Widest 128-multiple divisor of bkv that is <= target, with a
            bounded unroll (the one-shot sweeps and band branches are
            python-unrolled over bkv // inner sub-tiles). Non-pow2 padded
            lengths (e.g. 8000 -> 8064 = 63*128) otherwise gcd-snap the
            inner tile down to 128, which both runs slowly and explodes the
            traced program. None = no acceptable divisor."""
            for inner in range(target, 255, -MIN_BLOCK):
                if bkv % inner == 0 and bkv // inner <= 16:
                    return inner
            return None  # (a 128-wide inner measured ~2x slow: fall back)

        sk = seqlen_k
        # The one-shot / wide-KV rows want block_kv == the padded sequence;
        # compute the pad the wrapper will produce for that choice.
        sk_pad = -(-sk // MIN_BLOCK) * MIN_BLOCK

        bwd = dict(
            block_q_dq=clamp(1024, seqlen_q),
            block_kv_dq=clamp(1024, seqlen_k),
            block_q_dkv=clamp(1024, seqlen_q),
            block_kv_dkv=clamp(1024, seqlen_k),
        )
        if segmented:
            return cls(block_q=clamp(1024, seqlen_q),
                       block_kv=clamp(1024, seqlen_k), **bwd)
        # dq streams kv like the forward and gets the same wide one-shot +
        # band-switch treatment (measured: causal 4k 40 -> 44%, 8k 48 -> 53%
        # useful-FLOPs SOL; dense ~ +1%). dkv's mirrored structure LOSES wide
        # (its transposed matmuls need the classic block shapes, and the
        # (inner_q x block_kv) fp32 intermediates blow VMEM) — it keeps the
        # 1024^2 grid.
        if sk <= 8192 and pick_inner(sk_pad, 1024):
            bwd.update(block_q_dq=512 if sk <= 4096 else 256,
                       block_kv_dq=8192,
                       block_kv_dq_inner=pick_inner(sk_pad, 1024))
        if causal:
            if sk <= 512:
                fwd = dict(block_q=clamp(1024, seqlen_q), block_kv=512)
            elif sk <= 1024:
                fwd = dict(block_q=1024, block_kv=1024, block_q_inner=256)
            elif sk <= 2048 and pick_inner(sk_pad, 512):
                fwd = dict(block_q=2048, block_kv=2048,
                           block_kv_inner=pick_inner(sk_pad, 512),
                           block_q_inner=256)
            elif sk <= 8192 and pick_inner(sk_pad, 1024):
                # one-shot band switch (flash_fwd._band_branch): ~the dense
                # one-shot rate at exact causal FLOPs (8k: 74% vs 56% SOL)
                bq = 512 if sk <= 4096 else 256
                fwd = dict(block_q=bq, block_kv=8192,
                           block_kv_inner=pick_inner(sk_pad, 1024))
            else:
                fwd = dict(block_q=1024, block_kv=1024)
        else:
            if sk <= 512:
                fwd = dict(block_q=clamp(1024, seqlen_q), block_kv=512)
            elif sk <= 1024:
                fwd = dict(block_q=1024, block_kv=1024, block_kv_inner=512)
            elif sk <= 2048 and pick_inner(sk_pad, 512):
                fwd = dict(block_q=2048, block_kv=2048,
                           block_kv_inner=pick_inner(sk_pad, 512))
            elif sk <= 4096 and pick_inner(sk_pad, 1024):
                fwd = dict(block_q=512, block_kv=4096,
                           block_kv_inner=pick_inner(sk_pad, 1024))
            elif sk <= 8192 and pick_inner(sk_pad, 1024):
                fwd = dict(block_q=256, block_kv=8192,
                           block_kv_inner=pick_inner(sk_pad, 1024))
            else:
                fwd = dict(block_q=1024, block_kv=2048, block_kv_inner=1024)
        return cls(**fwd, **bwd)
