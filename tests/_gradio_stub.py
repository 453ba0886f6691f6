"""A minimal gradio stand-in so the UI wiring in serve/app.py can execute
headless (gradio is not installed in this container). Implements only the
API surface build_ui uses: component constructors, context managers, event
registration (.click/.change/.select), gr.update, and the template-response
hook used for JS injection. Registered handlers are recorded so tests can
drive them directly.
"""

import sys
import types


class _Component:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.registry = _REGISTRY

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def _register(self, kind, fn, inputs=None, outputs=None, **kw):
        self.registry.append({"kind": kind, "component": self, "fn": fn,
                              "inputs": inputs, "outputs": outputs, **kw})

    def click(self, fn=None, inputs=None, outputs=None, **kw):
        self._register("click", fn, inputs, outputs, **kw)

    def change(self, fn=None, inputs=None, outputs=None, **kw):
        self._register("change", fn, inputs, outputs, **kw)

    def select(self, fn=None, inputs=None, outputs=None, **kw):
        self._register("select", fn, inputs, outputs, **kw)


_REGISTRY = []


class _Templates:
    TemplateResponse = staticmethod(lambda *a, **k: None)


class _Routes:
    templates = _Templates()


class _Error(Exception):
    pass


class _SelectData:
    index = 0


def _update(*args, **kwargs):
    return {"__type__": "update", **kwargs}


def install():
    """Install the stub as sys.modules['gradio']; returns the handler registry."""
    _REGISTRY.clear()
    g = types.ModuleType("gradio")
    for name in ("Blocks", "Tabs", "TabItem", "Accordion", "Row", "Column",
                 "Textbox", "State", "Dropdown", "Button", "Markdown",
                 "Slider", "Radio", "Checkbox", "File", "HTML", "Audio"):
        setattr(g, name, type(name, (_Component,), {}))
    g.update = _update
    g.Error = _Error
    g.SelectData = _SelectData
    g.routes = _Routes()
    sys.modules["gradio"] = g
    return _REGISTRY
