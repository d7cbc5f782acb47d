def __getattr__(name):
    raise RuntimeError(
        f"vjepa2 stub: volume_transforms.{name} unavailable offline"
    )
