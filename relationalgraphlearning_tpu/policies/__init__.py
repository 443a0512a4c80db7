"""Policy package. ``policy_factory``/``make_policy`` are re-exported
lazily (PEP 562) so importing a leaf module (e.g. ``state_transform`` from
``models``) does not drag the whole registry in and create an import cycle.
"""


def __getattr__(name):
    if name in ("policy_factory", "make_policy"):
        from relationalgraphlearning_tpu.policies import factory

        return getattr(factory, name)
    raise AttributeError(name)
