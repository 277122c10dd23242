"""Fiat-Shamir duplex-sponge transcript (plonky2 Challenger), pure-int.

Exact semantics the TPU transcript must reproduce bit-for-bit
(reference: verifier/src/challenger/mod.rs):
  - observe clears the output buffer, then appends to the input buffer
    (mod.rs:45-50); eager duplexing per full rate-chunk is equivalent to the
    chip's lazy chunked absorb (mod.rs:261-277).
  - get_challenge: absorb pending inputs (overwrite mode, rate-8 chunks,
    permute per chunk), refill the output buffer with state[0:8], then pop
    from the END of the output buffer (LIFO) (mod.rs:93-108).
"""

from .poseidon import NUM_HASH_OUT_ELTS, SPONGE_RATE, SPONGE_WIDTH, permute


class BN254Challenger:
    """ChallengerChip instantiated with the Poseidon-BN254 permutation chip —
    the reference trait's other instantiation (challenger/mod.rs:19 is generic
    over PermutationChip; permutation.rs:205-252 gives the BN254 absorb /
    squeeze):
      - observing a Goldilocks element clears the output buffer;
      - absorb: chunks of RATE*3 = 9 GL, each triple packed into one Fr
        OVERWRITING state slots 1..3 (partial chunks overwrite only the slots
        they cover; missing GL inside a covered slot pack as zero), one
        permutation per chunk, then the output buffer refills;
      - squeeze: state[0..RATE) as 5 x 56-bit limbs each -> 15 GL, popped
        LIFO (the last limb of slot 2 first)."""

    RATE_GL = 9      # RATE Fr x 3 packed GL
    OUT_GL = 15      # RATE Fr x 5 56-bit limbs

    def __init__(self):
        from . import poseidon_bn254 as pb

        self._pb = pb
        self.sponge_state = [0] * pb.WIDTH
        self.input_buffer = []
        self.output_buffer = []

    def observe_element(self, x):
        self.output_buffer.clear()
        self.input_buffer.append(x)

    def observe_elements(self, xs):
        for x in xs:
            self.observe_element(x)

    def observe_hash(self, h, hasher=None):
        """Observe a hash value (challenger/mod.rs:59-63 with the BN254
        sponge): `hasher` converts non-Goldilocks hash types; a bare list
        is a 4-element Goldilocks hash."""
        if hasher is not None:
            self.observe_elements(hasher.to_goldilocks_vec(h))
        else:
            assert len(h) == 4
            self.observe_elements(h)

    def observe_cap(self, cap, hasher=None):
        for h in cap:
            self.observe_hash(h, hasher)

    def observe_extension_element(self, e):
        self.observe_elements([e[0], e[1]])

    def observe_extension_elements(self, es):
        for e in es:
            self.observe_extension_element(e)

    def _absorb_buffered_inputs(self):
        pb = self._pb
        if not self.input_buffer:
            return
        for i in range(0, len(self.input_buffer), self.RATE_GL):
            chunk = self.input_buffer[i:i + self.RATE_GL]
            for j in range(0, len(chunk), 3):
                self.sponge_state[j // 3 + 1] = pb.pack_goldilocks(
                    chunk[j:j + 3])
            self.sponge_state = pb.permute(self.sponge_state)
        self.output_buffer = pb.squeeze_goldilocks(self.sponge_state)
        self.input_buffer.clear()

    def get_challenge(self):
        self._absorb_buffered_inputs()
        if not self.output_buffer:
            self.sponge_state = self._pb.permute(self.sponge_state)
            self.output_buffer = self._pb.squeeze_goldilocks(
                self.sponge_state)
        return self.output_buffer.pop()

    def get_n_challenges(self, n):
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        c = self.get_n_challenges(2)
        return (c[0], c[1])


class Challenger:
    def __init__(self):
        self.sponge_state = [0] * SPONGE_WIDTH
        self.input_buffer = []
        self.output_buffer = []

    # -- observing ----------------------------------------------------------

    def observe_element(self, x):
        self.output_buffer.clear()
        self.input_buffer.append(x)

    def observe_elements(self, xs):
        for x in xs:
            self.observe_element(x)

    def observe_hash(self, h, hasher=None):
        """Observe a hash value; `hasher` converts non-Goldilocks hash types
        (e.g. BN254 Fr -> 5 x 56-bit limbs, challenger/mod.rs:59-63)."""
        if hasher is not None:
            self.observe_elements(hasher.to_goldilocks_vec(h))
        else:
            assert len(h) == NUM_HASH_OUT_ELTS
            self.observe_elements(h)

    def observe_cap(self, cap, hasher=None):
        for h in cap:
            self.observe_hash(h, hasher)

    def observe_extension_element(self, e):
        self.observe_elements([e[0], e[1]])

    def observe_extension_elements(self, es):
        for e in es:
            self.observe_extension_element(e)

    # -- squeezing ----------------------------------------------------------

    def _absorb_buffered_inputs(self):
        if not self.input_buffer:
            return
        for i in range(0, len(self.input_buffer), SPONGE_RATE):
            chunk = self.input_buffer[i:i + SPONGE_RATE]
            self.sponge_state[:len(chunk)] = chunk
            self.sponge_state = permute(self.sponge_state)
        self.output_buffer = list(self.sponge_state[:SPONGE_RATE])
        self.input_buffer.clear()

    def get_challenge(self):
        self._absorb_buffered_inputs()
        if not self.output_buffer:
            self.sponge_state = permute(self.sponge_state)
            self.output_buffer = list(self.sponge_state[:SPONGE_RATE])
        return self.output_buffer.pop()

    def get_n_challenges(self, n):
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        c = self.get_n_challenges(2)
        return (c[0], c[1])
