"""Parse a jax.profiler xplane.pb and attribute device time to source lines.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/xprof.py <xplane.pb> [--top N]

Prints device time grouped by (a) HLO category, (b) source file:line of the
originating jaxpr op, (c) top individual fusions with shapes and achieved
FLOP/s / byte/s. This is the ground-truth view the optimization work keys on.
"""

import argparse
import collections
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("xplane")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--line-top", type=int, default=40)
    args = p.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(args.xplane, "rb") as f:
        xs.ParseFromString(f.read())
    plane = [pl for pl in xs.planes if "TPU" in pl.name][0]
    stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
    em = plane.event_metadata

    events = []  # (dur_ps, name, category, source, shape, flops, bytes)
    for line in plane.lines:
        for ev in line.events:
            md = em[ev.metadata_id]
            dur = 0
            for s in ev.stats:
                if stat_names.get(s.metadata_id) == "device_duration_ps":
                    dur = s.uint64_value
            info = {"category": "", "source": "", "shape": "", "flops": 0, "bytes": 0}
            for s in md.stats:
                n = stat_names.get(s.metadata_id)
                if n == "hlo_category":
                    info["category"] = s.str_value
                elif n == "source":
                    info["source"] = s.str_value
                elif n == "shape_with_layout":
                    info["shape"] = s.str_value
                elif n == "flops":
                    info["flops"] = s.int64_value
                elif n == "bytes_accessed":
                    info["bytes"] = s.int64_value
            if dur and not md.name.startswith("jit"):
                events.append((dur, md.name.split(" = ")[0], info))

    tot = sum(e[0] for e in events)
    print(f"total device time: {tot/1e12*1e3:.1f} ms over {len(events)} events\n")

    by_cat = collections.Counter()
    for dur, _, info in events:
        by_cat[info["category"]] += dur
    print("== by HLO category ==")
    for k, v in by_cat.most_common():
        print(f"{v/1e9:9.2f}ms {100*v/tot:5.1f}%  {k}")

    by_src = collections.Counter()
    src_bytes = collections.Counter()
    src_flops = collections.Counter()
    for dur, _, info in events:
        s = info["source"].replace("/root/repo/", "")
        by_src[s] += dur
        src_bytes[s] += info["bytes"]
        src_flops[s] += info["flops"]
    print("\n== by source line ==")
    print(f"{'ms':>9} {'%':>5} {'GB/s':>6} {'TF/s':>6}  source")
    for k, v in by_src.most_common(args.line_top):
        sec = v / 1e12
        gbs = src_bytes[k] / sec / 1e9 if sec else 0
        tfs = src_flops[k] / sec / 1e12 if sec else 0
        print(f"{v/1e9:9.2f} {100*v/tot:5.1f} {gbs:6.0f} {tfs:6.1f}  {k}")

    agg = {}
    for dur, name, info in events:
        key = name
        if key not in agg:
            agg[key] = [0, 0, info]
        agg[key][0] += dur
        agg[key][1] += 1
    print("\n== top ops ==")
    print(f"{'ms':>8} {'n':>3} {'GB/s':>6} {'TF/s':>6} {'cat':<16} {'src':<42} shape")
    for name, (dur, n, info) in sorted(agg.items(), key=lambda kv: -kv[1][0])[: args.top]:
        sec = dur / 1e12 / n
        gbs = info["bytes"] / sec / 1e9 if sec else 0
        tfs = info["flops"] / sec / 1e12 if sec else 0
        src = info["source"].replace("/root/repo/", "")[-42:]
        print(f"{dur/1e9:8.2f} {n:3d} {gbs:6.0f} {tfs:6.1f} {info['category'][:16]:<16} {src:<42} {info['shape'][:60]}")


if __name__ == "__main__":
    main()
