"""Every module imports cleanly (catches syntax/import rot in tools)."""

import importlib
import pkgutil

import cobevt_tpu


def test_import_all_modules():
    failures = []
    for mod in pkgutil.walk_packages(cobevt_tpu.__path__,
                                     prefix="cobevt_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # pragma: no cover
            failures.append((mod.name, repr(e)))
    assert not failures, failures
