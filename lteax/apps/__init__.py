"""Applications: DL frame generator, file scanner, multi-carrier scanner."""
