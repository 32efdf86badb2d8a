"""Schema feature types.

Named constructors for the column types adapters declare in ``schema()``.
These wrap HuggingFace ``datasets`` feature types (which serialize to Arrow
extension types) exactly like the reference (reference: vltk/features.py:6-95)
— but with two TPU-driven changes:

1. Fixed-shape variants are first-class. ``Features3D`` really returns an
   ``Array3D`` (the reference returned a mislabelled ``Array2D``; admitted at
   reference features.py:88) and ``Boxtensor(n)`` / ``FeaturesMatrix(n, d)``
   give adapters a way to commit to static capacities at *write* time, so the
   loader never pads per-batch (the reference padded at collate time, the main
   source of dynamic shapes: reference dataset/loader.py:101-126).
2. Every constructor is a plain function returning a ``datasets`` feature —
   no metaclass registry — so schemas stay introspectable.
"""

from __future__ import annotations

from datasets import Array2D, Array3D, Sequence, Value


class Features:
    """Namespace of named feature constructors (use as ``Features.Box()``)."""

    # ------------------------------------------------------------------
    # ragged (variable-length) types — host-side storage only; the loader
    # pads these to the capacities declared in vars.FIXED_SHAPE_KEYS before
    # anything reaches a device.
    # ------------------------------------------------------------------
    @staticmethod
    def Boxes():
        """Ragged list of (x, y, w, h) float boxes: shape [n, 4]."""
        return Sequence(
            length=-1, feature=Sequence(length=-1, feature=Value("float32"))
        )

    # legacy singular alias (reference: vltk/features.py:14-16)
    Box = Boxes

    @staticmethod
    def Polygons():
        """Ragged list of polygons, each a list of flat xy coords: [n, p, k]."""
        return Sequence(
            length=-1,
            feature=Sequence(
                length=-1, feature=Sequence(length=-1, feature=Value("float32"))
            ),
        )

    @staticmethod
    def RLE():
        """Run-length-encoded masks: ragged [n, runs]."""
        return Sequence(
            length=-1, feature=Sequence(length=-1, feature=Value("float32"))
        )

    @staticmethod
    def Segmentation():
        """Alias covering either polygons or RLE payloads."""
        return Features.Polygons()

    # ------------------------------------------------------------------
    # fixed-shape types — preferred for anything that feeds the device
    # ------------------------------------------------------------------
    @staticmethod
    def Boxtensor(n: int):
        """Exactly-n boxes, padded with zeros: shape (n, 4)."""
        return Array2D((n, 4), dtype="float32")

    @staticmethod
    def Features2D(d: int):
        """Ragged-rows feature matrix [-1, d] (row count varies)."""
        return Array2D((None, d), dtype="float32")

    @staticmethod
    def FeaturesMatrix(n: int, d: int):
        """Exactly (n, d) feature matrix — the fixed-shape workhorse."""
        return Array2D((n, d), dtype="float32")

    @staticmethod
    def Features3D(n: int, d: int):
        """True 3-D feature tensor [-1, n, d].

        The reference's ``Features3D`` returned an Array2D by mistake
        (reference: vltk/features.py:88-95); here it is a real Array3D.
        """
        return Array3D((None, n, d), dtype="float32")

    @staticmethod
    def Mask(h: int, w: int):
        """Fixed-shape binary mask (h, w) stored as uint8."""
        return Array2D((h, w), dtype="uint8")

    # ------------------------------------------------------------------
    # scalars & lists
    # ------------------------------------------------------------------
    @staticmethod
    def String():
        return Value("string")

    @staticmethod
    def StringList():
        return Sequence(length=-1, feature=Value("string"))

    @staticmethod
    def Int():
        return Value("int32")

    @staticmethod
    def IntList():
        return Sequence(length=-1, feature=Value("int32"))

    @staticmethod
    def Float():
        return Value("float32")

    @staticmethod
    def FloatList():
        return Sequence(length=-1, feature=Value("float32"))

    @staticmethod
    def Span():
        """(start, end) token span."""
        return Sequence(length=2, feature=Value("int32"))

    @staticmethod
    def Ids():
        return Sequence(length=-1, feature=Value("float32"))

    @staticmethod
    def NestedIds():
        return Sequence(
            length=-1, feature=Sequence(length=-1, feature=Value("float32"))
        )

    @staticmethod
    def Imgid():
        return Value("string")
