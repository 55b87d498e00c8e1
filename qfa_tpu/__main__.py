"""``python -m qfa_tpu`` — module-exec entry mirroring ``qfa-tpu``.

The reference is driven as a plain script (``python main.py --cfg ...``,
/root/reference/main.py:16-42); the packaged equivalents here are the
``qfa-tpu`` console script and this module entry, both dispatching to
:func:`qfa_tpu.cli.main`.
"""

from .cli import main

if __name__ == "__main__":
    main()
