"""Extract test fixtures from the reference repository's golden data.

The reference ships RTL-simulation golden files (data/ref_rect_{l,r}.zip,
hex-text 640x480 grayscale — see SURVEY.md §4) used to validate its FPGA
pipeline blocks.  We reuse the same *data* (not code) as the input stimulus
for our kernel-vs-oracle tests, mirroring the reference's own test strategy.

Also extracts the standard OpenCV ORB sampling pattern (bit_pattern_31_,
a public BSD-licensed numeric constant, vendored by the reference at
src/slam/include/opencv/CvORB.h:27) into a .npy table — our ORB kernel
needs the identical pattern to produce matching descriptors.

Run: python tools/extract_fixtures.py
"""

import os
import re
import zipfile

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def extract_rect(side: str) -> np.ndarray:
    zpath = os.path.join(REF, "data", f"ref_rect_{side}.zip")
    with zipfile.ZipFile(zpath) as z:
        name = z.namelist()[0]
        text = z.read(name).decode()
    vals = np.array([int(v, 16) for v in text.split()], dtype=np.uint8)
    assert vals.size == 640 * 480, vals.size
    return vals.reshape(480, 640)


def extract_orb_pattern() -> np.ndarray:
    hdr = os.path.join(REF, "src/slam/include/opencv/CvORB.h")
    text = open(hdr).read()
    m = re.search(r"bit_pattern_31_2\[256 \* 4\]\s*=\s*\{(.*?)\};", text, re.S)
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    nums = [int(v) for v in re.findall(r"-?\d+", body)]
    assert len(nums) == 1024, len(nums)
    return np.array(nums, dtype=np.int32).reshape(512, 2)  # (x, y) pairs


def extract_xsbl(side: str) -> np.ndarray:
    """Golden X-Sobel prefilter output (data/ref_xsbl_{l,r}.zip),
    6-bit offset-binary values produced by the PL xsbl2 block from the
    ref_rect frames."""
    zpath = os.path.join(REF, "data", f"ref_xsbl_{side}.zip")
    with zipfile.ZipFile(zpath) as z:
        text = z.read(z.namelist()[0]).decode()
    vals = np.array([int(v, 16) for v in text.split()], dtype=np.uint8)
    assert vals.size == 640 * 480, vals.size
    return vals.reshape(480, 640)


def extract_raw(side: str) -> np.ndarray:
    """Raw CSI stimulus frame (src/dvp/sim/img_001_{l,r}.dat)."""
    path = os.path.join(REF, "src/dvp/sim", f"img_001_{side}.dat")
    vals = np.array([int(v, 16) for v in open(path).read().split()],
                    dtype=np.uint8)
    assert vals.size == 640 * 480, vals.size
    return vals.reshape(480, 640)


def main():
    os.makedirs(OUT, exist_ok=True)
    np.save(os.path.join(OUT, "rect_left.npy"), extract_rect("l"))
    np.save(os.path.join(OUT, "rect_right.npy"), extract_rect("r"))
    np.save(os.path.join(OUT, "xsbl_left.npy"), extract_xsbl("l"))
    np.save(os.path.join(OUT, "xsbl_right.npy"), extract_xsbl("r"))
    np.save(os.path.join(OUT, "raw_left.npy"), extract_raw("l"))
    np.save(os.path.join(OUT, "raw_right.npy"), extract_raw("r"))
    pattern = extract_orb_pattern()
    np.save(os.path.join(OUT, "orb_pattern.npy"), pattern)
    # kernels use the pattern as package data as well
    pkg_data = os.path.join(os.path.dirname(__file__), "..", "tpuslam",
                            "kernels", "data")
    os.makedirs(pkg_data, exist_ok=True)
    np.save(os.path.join(pkg_data, "orb_pattern.npy"), pattern)
    print("fixtures written:", os.listdir(OUT))


if __name__ == "__main__":
    main()
