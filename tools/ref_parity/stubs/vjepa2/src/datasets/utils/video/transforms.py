def __getattr__(name):
    raise RuntimeError(f"vjepa2 stub: transforms.{name} unavailable offline")
