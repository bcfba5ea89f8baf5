#!/usr/bin/env python
"""JPG -> PNG conversion for cloud-storage staging (reference
tools/misc/process_data_for_gcs.py:4-27 capability)."""

import argparse
import concurrent.futures as cf
import os


def convert_tree(src: str, dst: str, workers: int = 8):
    import cv2

    jobs = []
    for root, _, files in os.walk(src):
        for f in files:
            if f.lower().endswith((".jpg", ".jpeg")):
                rel = os.path.relpath(os.path.join(root, f), src)
                jobs.append(rel)

    def one(rel):
        img = cv2.imread(os.path.join(src, rel))
        out = os.path.join(dst, os.path.splitext(rel)[0] + ".png")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        cv2.imwrite(out, img)

    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(one, jobs))
    return len(jobs)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("-j", "--workers", type=int, default=8)
    args = p.parse_args()
    n = convert_tree(args.src, args.dst, args.workers)
    print(f"converted {n} images")
