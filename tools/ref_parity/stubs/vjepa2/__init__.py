# vjepa2 stub tree: import-time only (the vfm tokenizer family constructs
# the teacher lazily; the parity harness never instantiates it).
