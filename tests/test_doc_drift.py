"""Doc-drift guards.

The r7 AND r8 verdicts each caught a stale "remaining boundary" claim
in a codec docstring after a boundary closed (progressive JPEG stayed
listed as unimplemented for a round). This pins the invariant: every
"remaining ... boundary" sentence in the source may only name codec
features that still raise NotImplementedError — shipped families must
never appear in one.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "falcon_metrics_etl_spark"

# codec families with REAL decode paths (each verified by an oracled
# query and/or fuzz pytest) — none of these may be claimed as a
# remaining boundary anywhere
SHIPPED = (
    "progressive",   # SOF2 spectral selection + successive approx (r8)
    "adam7",         # PNG interlace matrix (r6)
    "interlaced png",
    "16-bit png",
    "palette",       # PNG color types (r6)
    "adpcm",         # MS + IMA (r7)
    "g.711",         # A-law / mu-law (r7)
    "4:2:0",         # chroma subsampled JPEG (r7/r8)
)


def _boundary_claims() -> list[tuple[str, str]]:
    claims = []
    for py in sorted(PKG.rglob("*.py")):
        text = py.read_text(encoding="utf-8")
        for m in re.finditer(
            r"remain(?:ing|s)?[^.]{0,240}?boundar(?:y|ies)[^.]{0,240}?\.",
            text,
            re.IGNORECASE | re.DOTALL,
        ):
            claims.append((str(py.relative_to(PKG)), m.group(0)))
    return claims


def test_boundary_docstrings_name_only_live_stubs():
    claims = _boundary_claims()
    # the honest-boundary docs are a feature — they must exist
    assert len(claims) >= 4, claims
    for fname, claim in claims:
        # collapse source-literal artifacts ("..." "..." concatenation,
        # line breaks) before matching
        flat = re.sub(r"[\s\"']+", " ", claim.lower())
        for term in SHIPPED:
            assert term not in flat, (
                f"{fname}: boundary claim names shipped codec {term!r} "
                f"— stale doc (r7/r8 drift class): {flat[:160]}"
            )


def test_still_stubbed_codecs_really_raise():
    """The inverse direction: the codecs the docs DO claim as
    boundaries must still have a NotImplementedError guard — if one
    ships, its guard disappears and this forces the doc update."""
    text = "\n".join(
        p.read_text(encoding="utf-8") for p in sorted(PKG.rglob("*.py"))
    )
    for stub_marker in (
        "arithmetic",          # JPEG SOF9+ (jpeg.py dispatch guard)
        "mp3",                 # perceptual audio in WAV
        "real media decoding not available",  # compressed video etc.
    ):
        guard = re.search(
            r"NotImplementedError\((?:[^)]|\n){0,400}?" + stub_marker,
            text,
            re.IGNORECASE,
        ) or re.search(
            stub_marker + r"(?:[^.]|\n){0,200}?NotImplementedError",
            text,
            re.IGNORECASE,
        )
        assert guard, f"no NotImplementedError guard mentions {stub_marker!r}"
