from . import codecs, synth  # noqa: F401
