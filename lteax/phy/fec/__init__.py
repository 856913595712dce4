"""36.212 FEC bitpipe: CRC, convolutional + Viterbi, turbo + max-log-MAP,
rate matching, code-block segmentation."""
