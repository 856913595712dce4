"""Host-side control-plane codecs (RRC/NAS subsets, bands, security).

The dataplane stops at transport-block bits (SURVEY.md §1); everything here
is plain Python/numpy on host, mirroring the capability surface of the
reference's ``liblte_rrc``/``liblte_mme``/``liblte_security``/
``liblte_interface`` for the paths the DL apps exercise.
"""
