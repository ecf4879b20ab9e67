"""TTF font baking (pure-python TrueType parser + rasterizer)."""

import os

import numpy as np
import pytest

TTF = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
pytestmark = pytest.mark.skipif(not os.path.exists(TTF),
                                reason="no system TTF available")


def test_parse_and_glyph_lookup():
    from datum_tpu.tools.ttf import TrueTypeFont

    ttf = TrueTypeFont(TTF)
    assert ttf.units_per_em in (1000, 2048)
    ga = ttf.glyph_id("A")
    assert ga != 0 and ttf.glyph_id("B") not in (0, ga)
    assert ttf.advance(ga) > 0
    conts = ttf.glyph_contours(ga)
    assert len(conts) >= 2            # 'A' = outer outline + counter


def test_bake_font_atlas_and_draw():
    from datum_tpu.tools.ttf import bake_font
    from datum_tpu.render.sprite import draw_text

    font = bake_font(TTF, size=24, chars="ABCHeloWrd! ")
    gi = font.glyph_index("A")
    assert gi > 0
    w, h = int(font.width[gi]), int(font.height[gi])
    assert 8 <= w <= 30 and 12 <= h <= 30
    # glyph has ink and anti-aliased edges
    gx, gy = int(font.x[gi]), int(font.y[gi])
    a = font.atlas[gy:gy + h, gx:gx + w, 3]
    assert a.max() == 255 and ((a > 0) & (a < 255)).any()
    # 'o' counter: centre of the glyph is empty (nonzero winding worked)
    go = font.glyph_index("o")
    ow, oh = int(font.width[go]), int(font.height[go])
    oa = font.atlas[int(font.y[go]):int(font.y[go]) + oh,
                    int(font.x[go]):int(font.x[go]) + ow, 3]
    assert oa[oh // 2, ow // 2] < 64

    img = np.zeros((64, 256, 3), np.uint8)
    adv = draw_text(img, font, "Hello World!", 4, 40, tint=(1, 1, 0, 1))
    assert adv > 80
    assert (img[:, :, 0] > 128).sum() > 150   # yellow ink
    assert (img[:, :, 2] > 64).sum() == 0


def test_pack_ttf_roundtrip(tmp_path):
    from datum_tpu.asset.pack import PackReader, PackWriter
    from datum_tpu.tools.assetbuilder import pack_ttf_font

    w = PackWriter()
    font = pack_ttf_font(w, 10, 11, TTF, size=16, chars="ABC0")
    p = tmp_path / "font.pack"
    w.save(str(p))
    r = PackReader(str(p))
    fa = r.font(10)
    assert fa["glyphcount"] == font.glyphcount
    assert (np.asarray(fa["advance"]) == font.advance).all()
    ia = r.image(11)
    assert ia["width"] == font.atlas.shape[1]
