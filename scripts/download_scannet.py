#!/usr/bin/env python
"""ScanNet public-release downloader (parity with the reference's
``datasets/scannet/download-scannet.py``). Requires accepting the ScanNet
Terms of Service; see http://www.scan-net.org/.
"""

import argparse
import os
import tempfile
import urllib.request

BASE_URL = "http://kaldir.vc.in.tum.de/scannet/"
TOS_URL = BASE_URL + "ScanNet_TOS.pdf"
RELEASE = "v2/scans"
RELEASE_TASKS = "v2/tasks"
FILETYPES = [
    ".aggregation.json", ".sens", ".txt",
    "_vh_clean.ply", "_vh_clean_2.0.010000.segs.json", "_vh_clean_2.ply",
    "_vh_clean.segs.json", "_vh_clean.aggregation.json",
    "_vh_clean_2.labels.ply",
    "_2d-instance.zip", "_2d-instance-filt.zip",
    "_2d-label.zip", "_2d-label-filt.zip",
]


def download_file(url, out_file):
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    if os.path.isfile(out_file):
        print(f"skipping {out_file} (exists)")
        return
    print(f"downloading {url} -> {out_file}")
    fh, tmp = tempfile.mkstemp(dir=os.path.dirname(out_file))
    os.close(fh)
    urllib.request.urlretrieve(url, tmp)
    os.rename(tmp, out_file)


def download_scan(scan_id, out_dir, file_types):
    for ft in file_types:
        url = f"{BASE_URL}{RELEASE}/{scan_id}/{scan_id}{ft}"
        download_file(url, os.path.join(out_dir, scan_id, scan_id + ft))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--id", help="single scan id (e.g. scene0000_00)")
    p.add_argument("--file_types", nargs="+", default=FILETYPES,
                   choices=FILETYPES)
    p.add_argument("--yes", action="store_true",
                   help="skip the terms-of-service prompt")
    args = p.parse_args()

    if not args.yes:
        print(f"By continuing you confirm acceptance of the ScanNet TOS: "
              f"{TOS_URL}")
        if input("continue? [y/N] ").lower() != "y":
            return
    if args.id:
        download_scan(args.id, args.out_dir, args.file_types)
    else:
        p.error("--id is required (bulk download needs the official list)")


if __name__ == "__main__":
    main()
