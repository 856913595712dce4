"""Physical channel codecs: PBCH, PCFICH, PHICH, PDCCH(+DCI), PDSCH."""
