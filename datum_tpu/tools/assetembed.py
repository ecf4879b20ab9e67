"""Image -> embeddable source array.

Reference parity: tools/assetembed (produced test/fallback.h — the
64x32 logo the engine presents before assets stream in).  Emits a
Python module or C header with the raw RGBA bytes.
"""

from __future__ import annotations

import numpy as np


def embed_image(image: np.ndarray, name="embedded", lang="py") -> str:
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * 255 + 0.5, 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    data = img.tobytes()
    if lang == "c":
        vals = ",".join(str(b) for b in data)
        return (f"static const unsigned {name}_width = {w};\n"
                f"static const unsigned {name}_height = {h};\n"
                f"static const unsigned char {name}_data[] = {{{vals}}};\n")
    rows = [data[i:i + 32] for i in range(0, len(data), 32)]
    body = "\n".join("    " + repr(r) for r in rows)
    return (f"{name}_width = {w}\n{name}_height = {h}\n"
            f"{name}_data = (\n{body}\n)\n")


if __name__ == "__main__":
    import sys
    from PIL import Image

    img = np.asarray(Image.open(sys.argv[1]).convert("RGBA"))
    out = embed_image(img, name=sys.argv[3] if len(sys.argv) > 3 else "embedded",
                      lang="c" if sys.argv[2].endswith(".h") else "py")
    with open(sys.argv[2], "w") as f:
        f.write(out)
    print(f"embedded {sys.argv[1]} -> {sys.argv[2]}")
