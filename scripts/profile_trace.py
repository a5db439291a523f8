#!/usr/bin/env python
"""Kernel-level breakdown of the flagship forward from a profiler trace.

Captures a jax.profiler trace of the jitted forward (no device-side
loop -- each dispatched kernel shows up individually) and aggregates
XLA-op durations from the xplane proto, parsed with a minimal built-in
protobuf reader (the installed tensorboard profile plugin's converter is
incompatible with the env's TF/protobuf). This is the ground-truth
attribution: scripts/profile_ablate.py's config-toggle diffs overstate
small stages (toggling changes fusion around them -- docs/PARITY.md).
"""

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# ---- minimal protobuf wire-format reader (xplane.proto subset) ----

def _fields(buf):
    """Yield (field_no, wire_type, value) from a serialized message."""
    i, n = 0, len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wt, v
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            yield field, wt, buf[i:i + 4]
            i += 4
        elif wt == 1:  # 64-bit
            yield field, wt, buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")


def parse_xspace(buf):
    """XSpace -> [(plane_name, {line_name: [(ev_name, duration_ps)]})]."""
    planes = []
    for f, wt, v in _fields(buf):
        if f != 1:
            continue
        name = ""
        lines = []
        ev_names = {}
        for pf, pwt, pv in _fields(v):
            if pf == 2:
                name = pv.decode("utf-8", "replace")
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                mid, meta = None, None
                for mf, mwt, mv in _fields(pv):
                    if mf == 1:
                        mid = mv
                    elif mf == 2:
                        meta = mv
                if mid is not None and meta is not None:
                    mname = ""
                    for ef, ewt, ev in _fields(meta):
                        if ef == 2:
                            mname = ev.decode("utf-8", "replace")
                    ev_names[mid] = mname
        parsed_lines = {}
        for lbuf in lines:
            lname = ""
            events = []
            for lf, lwt, lv in _fields(lbuf):
                if lf == 2:
                    lname = lv.decode("utf-8", "replace")
                elif lf == 4:
                    mid, off, dur = 0, 0, 0
                    for ef, ewt, ev in _fields(lv):
                        if ef == 1:
                            mid = ev
                        elif ef == 2:
                            off = ev
                        elif ef == 3:
                            dur = ev
                    events.append((ev_names.get(mid, str(mid)), off, dur))
            parsed_lines.setdefault(lname, []).extend(events)
        planes.append((name, parsed_lines))
    return planes


def self_times(events):
    """De-nested per-op self time from (name, offset_ps, duration_ps).

    Control-flow wrappers (``conditional``, ``while``) appear on the
    "XLA Ops" line as events that CONTAIN their body ops; summing raw
    durations double-counts the bodies (~0.7 ms/iter on the flagship
    forward: the warp dispatch cond contains the Pallas call, the chain
    while contains its scan body). A containment-stack walk charges each
    op only the time not covered by its children.
    """
    events = sorted(events, key=lambda e: e[1])
    stack = []  # [name, start, end, child_time]
    out = collections.Counter()

    def pop_until(off):
        while stack and stack[-1][2] <= off:
            nm, s, e, ch = stack.pop()
            out[nm] += (e - s) - ch
            if stack:
                stack[-1][3] += (e - s)

    for name, off, dur in events:
        pop_until(off)
        stack.append([name, off, off + dur, 0])
    pop_until(float("inf"))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--views", type=int, default=1,
                    help="comparison views V (5 = the 5cmp test config)")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--train", action="store_true",
                    help="trace the full training step (fwd+bwd+optax) "
                         "instead of the inference forward")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multi_view_stereonet_tpu.models import (
        MultiViewStereoNetConfig, mvsnet_forward, init_mvsnet,
    )
    from multi_view_stereonet_tpu.train.pipeline import multi_view_unpack_batch
    from __graft_entry__ import _example_batch

    params = init_mvsnet(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray,
                         _example_batch(B=args.batch, V=args.views,
                                        H=480, W=640))
    config = MultiViewStereoNetConfig(compute_dtype=args.dtype)

    if args.train:
        from multi_view_stereonet_tpu.losses import LossConfig
        from multi_view_stereonet_tpu.train.step import (
            OptimizerConfig, make_optimizer, make_train_step,
        )

        tx = make_optimizer(OptimizerConfig())
        opt_state = tx.init(params)
        train_step = make_train_step(config, LossConfig(), tx)

        @jax.jit
        def step(params, batch, t):
            b = dict(batch)
            b["left_image"] = batch["left_image"] + t
            p, _, loss, _ = train_step(params, opt_state, b)
            # Keep every updated-param leaf live: returning only the loss
            # lets XLA DCE the whole backward + optimizer update, which
            # would silently turn this into a forward-only trace.
            live = jax.tree_util.tree_reduce(
                lambda a, leaf: a + jnp.sum(leaf.astype(jnp.float32)),
                p, jnp.float32(0.0))
            return loss + 1e-20 * live
    else:
        @jax.jit
        def step(params, batch, t):
            inputs = multi_view_unpack_batch(batch)
            left = inputs["left_image_pyr"]
            left = [left[0] + t] + list(left[1:])
            out = mvsnet_forward(params, left, inputs["K_pyr"],
                                 inputs["T_right_in_left"],
                                 inputs["right_image_pyr"], config)
            return jnp.sum(out["left_idepthmap_pyr"][0])

    float(step(params, batch, jnp.float32(0.0)))  # compile + warm

    tracedir = tempfile.mkdtemp(prefix="trace_")
    with jax.profiler.trace(tracedir):
        for i in range(args.iters):
            float(step(params, batch, jnp.float32(i) * 1e-9))

    xplanes = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane captured in", tracedir)
        return

    with open(xplanes[0], "rb") as f:
        planes = parse_xspace(f.read())

    per_op = collections.Counter()
    for pname, lines in planes:
        if "TPU" not in pname:
            continue
        for lname, events in lines.items():
            if lname != "XLA Ops":
                continue
            per_op.update(self_times(events))

    if not per_op:
        print("no 'XLA Ops' line; planes/lines found:")
        for pname, lines in planes:
            print(" ", pname, "->", list(lines))
        return

    n = args.iters
    total_ps = sum(per_op.values())
    print(f"total device self-time {total_ps / 1e9 / n:.3f} ms/iter over "
          f"{len(per_op)} distinct ops (control-flow wrappers de-nested)")
    churn_kinds = ("copy", "reshape", "select_bitcast", "slice_bitcast",
                   "broadcast_select", "copy_bitcast", "transpose")
    churn = sum(ps for nm, ps in per_op.items()
                if any(nm.lstrip("%").startswith(k) for k in churn_kinds))
    print(f"layout churn (copy/reshape/select_bitcast/...): "
          f"{churn / 1e9 / n:.3f} ms/iter\n")

    def bucket(name):
        base = name.split(".")[0].rstrip("0123456789_")
        return base

    agg = collections.Counter()
    for name, ps in per_op.items():
        agg[bucket(name)] += ps
    print("by op kind (ms/iter):")
    for k, ps in agg.most_common(25):
        print(f"  {k:28s} {ps / 1e9 / n:8.3f}")

    print(f"\ntop {args.top} ops (ms/iter):")
    for name, ps in per_op.most_common(args.top):
        print(f"  {ps / 1e9 / n:8.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
