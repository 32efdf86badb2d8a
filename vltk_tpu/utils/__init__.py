from vltk_tpu.utils import adapters, base
