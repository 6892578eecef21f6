"""KITTI raw dataset preparation: download, unzip, convert to JPEG.

The reference ships the archive list (splits/archives2download.txt, 65
KITTI raw zips) and a manual recipe in its README (:33-53 — `wget -i`,
`unzip "*.zip"`, then an imagemagick/parallel png->jpg pass). This tool
is that recipe as one resumable command, pure-Python (urllib / zipfile /
PIL), so a fresh TPU-VM host needs no imagemagick or GNU parallel:

    python tools/prepare_kitti.py --out ./dataset/kitti \
        [--archives splits/archives2download.txt] \
        [--steps download,unzip,to_jpeg] [--jobs N]

- download: fetches each zip into <out>/zips/, resuming partial files
  via HTTP Range and skipping completed ones (size check), so the
  ~175 GB transfer survives interruption.
- unzip: extracts into <out>/, skipping members that already exist with
  the right size (re-runnable).
- to_jpeg: converts every camera png (image_00..03/data/*.png) to
  quality-92 4:2:0 JPEG — the exact settings of the reference's
  `convert -quality 92 -sampling-factor 2x2,1x1,1x1` — deleting the png,
  parallel over --jobs processes. Velodyne .bin, calib .txt and OXTS
  files are untouched. The loaders default to ext=".jpg"
  (data/dataset.py:45); pass ext=".png" to skip this step and train on
  the originals.

Every step prints progress and is safe to re-run; the tool never
overwrites a finished artifact.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import sys
import urllib.error
import urllib.request
import zipfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_ARCHIVES = os.path.join(_ROOT, "splits", "archives2download.txt")
JPEG_QUALITY = 92
JPEG_SUBSAMPLING = 2  # PIL code for 4:2:0 == imagemagick 2x2,1x1,1x1


def read_archive_list(path: str) -> list:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


# ------------------------------------------------------------- download
def _remote_size(url: str) -> int:
    req = urllib.request.Request(url, method="HEAD")
    with urllib.request.urlopen(req, timeout=60) as r:
        size = int(r.headers.get("Content-Length", -1))
    if size >= 0:
        return size
    # HEAD gave no Content-Length (some mirrors strip it); a 1-byte Range
    # GET carries the full size in Content-Range: "bytes 0-0/TOTAL"
    req = urllib.request.Request(url, headers={"Range": "bytes=0-0"})
    with urllib.request.urlopen(req, timeout=60) as r:
        rng = r.headers.get("Content-Range", "")
        r.read()
    tail = rng.rsplit("/", 1)[-1]
    return int(tail) if tail.isdigit() else -1


def download_one(url: str, zip_dir: str, chunk: int = 1 << 20) -> str:
    """Fetch one archive, resuming a partial .part file via HTTP Range."""
    name = url.rsplit("/", 1)[-1]
    dst = os.path.join(zip_dir, name)
    part = dst + ".part"
    total = _remote_size(url)
    if os.path.exists(dst) and total < 0:
        # size unverifiable: keep the file but say so — a truncated
        # earlier download would be silently accepted otherwise
        return f"skip {name} (exists; remote size unknown, NOT verified)"
    if os.path.exists(dst) and os.path.getsize(dst) == total:
        return f"skip {name} (complete)"
    have = os.path.getsize(part) if os.path.exists(part) else 0
    headers = {"Range": f"bytes={have}-"} if have else {}
    req = urllib.request.Request(url, headers=headers)
    try:
        resp = urllib.request.urlopen(req, timeout=120)
    except urllib.error.HTTPError as e:
        if e.code == 416 and have and have == total:
            # already fully fetched, just not renamed; an over-long or
            # wrong-size .part (changed remote, corrupt append) must NOT
            # be promoted — start that file over
            os.replace(part, dst)
            return f"done {name}"
        if e.code == 416:
            os.remove(part)
            raise IOError(f"{name}: stale partial ({have} bytes vs remote "
                          f"{total}); removed — re-run to re-download")
        raise
    mode = "ab" if have and resp.status == 206 else "wb"
    with resp, open(part, mode) as f:
        while True:
            buf = resp.read(chunk)
            if not buf:
                break
            f.write(buf)
    if total >= 0 and os.path.getsize(part) != total:
        raise IOError(f"{name}: got {os.path.getsize(part)} of {total} "
                      f"bytes (re-run to resume)")
    os.replace(part, dst)
    return f"done {name}"


def step_download(urls, out: str, jobs: int) -> None:
    zip_dir = os.path.join(out, "zips")
    os.makedirs(zip_dir, exist_ok=True)
    # KITTI's server throttles per-connection; a few parallel streams
    # saturate most links without hammering it
    with cf.ThreadPoolExecutor(max_workers=min(jobs, 4)) as pool:
        for i, msg in enumerate(pool.map(
                lambda u: download_one(u, zip_dir), urls)):
            print(f"[{i + 1}/{len(urls)}] {msg}", flush=True)


# --------------------------------------------------------------- unzip
def step_unzip(out: str) -> None:
    zip_dir = os.path.join(out, "zips")
    zips = sorted(f for f in os.listdir(zip_dir) if f.endswith(".zip")) \
        if os.path.isdir(zip_dir) else []
    if not zips:
        print(f"no zips under {zip_dir}; run --steps download first")
        return
    for i, name in enumerate(zips):
        n_new = 0
        with zipfile.ZipFile(os.path.join(zip_dir, name)) as zf:
            for m in zf.infolist():
                dst = os.path.join(out, m.filename)
                if not m.is_dir() and (
                        not os.path.exists(dst)
                        or os.path.getsize(dst) != m.file_size):
                    zf.extract(m, out)
                    n_new += 1
        print(f"[{i + 1}/{len(zips)}] {name}: {n_new} files", flush=True)


# ------------------------------------------------------------- to_jpeg
def convert_one(png_path: str) -> bool:
    from PIL import Image

    jpg_path = png_path[:-4] + ".jpg"
    if os.path.exists(jpg_path):
        os.remove(png_path)
        return False
    tmp = jpg_path + ".tmp"
    with Image.open(png_path) as im:
        im.convert("RGB").save(tmp, "JPEG", quality=JPEG_QUALITY,
                               subsampling=JPEG_SUBSAMPLING)
    os.replace(tmp, jpg_path)  # atomic: no half-written .jpg on crash
    os.remove(png_path)
    return True


def find_camera_pngs(out: str) -> list:
    """Camera frames only (image_00..03/data/*.png) — velodyne/calib and
    any non-KITTI pngs a user drops in the tree are left alone."""
    hits = []
    for dirpath, _, files in os.walk(out):
        parts = dirpath.split(os.sep)
        if len(parts) >= 2 and parts[-1] == "data" \
                and parts[-2].startswith("image_0"):
            hits += [os.path.join(dirpath, f) for f in files
                     if f.endswith(".png")]
    return sorted(hits)


def step_to_jpeg(out: str, jobs: int) -> None:
    pngs = find_camera_pngs(out)
    if not pngs:
        print("no camera pngs found (already converted?)")
        return
    print(f"converting {len(pngs)} pngs with {jobs} workers "
          f"(quality {JPEG_QUALITY}, 4:2:0)")
    done = 0
    with cf.ProcessPoolExecutor(max_workers=jobs) as pool:
        for _ in pool.map(convert_one, pngs, chunksize=64):
            done += 1
            if done % 5000 == 0:
                print(f"  {done}/{len(pngs)}", flush=True)
    print(f"converted {done} images")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", required=True, help="dataset root (--datapath)")
    p.add_argument("--archives", default=DEFAULT_ARCHIVES)
    p.add_argument("--steps", default="download,unzip,to_jpeg",
                   help="comma list of download,unzip,to_jpeg")
    p.add_argument("--jobs", type=int, default=os.cpu_count() or 4)
    args = p.parse_args(argv)
    # <out>/zips is never deleted automatically — 175 GB of re-download
    # is worse than 175 GB of disk; remove it by hand once training runs.

    steps = [s.strip() for s in args.steps.split(",") if s.strip()]
    bad = set(steps) - {"download", "unzip", "to_jpeg"}
    if bad:
        p.error(f"unknown steps {sorted(bad)}")
    os.makedirs(args.out, exist_ok=True)
    if "download" in steps:
        step_download(read_archive_list(args.archives), args.out, args.jobs)
    if "unzip" in steps:
        step_unzip(args.out)
    if "to_jpeg" in steps:
        step_to_jpeg(args.out, args.jobs)
    print("prepare_kitti: all requested steps complete")


if __name__ == "__main__":
    sys.exit(main())
