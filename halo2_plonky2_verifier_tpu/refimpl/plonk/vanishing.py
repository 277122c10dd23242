"""plonky2 vanishing-polynomial evaluation (shared term stream).

The SINGLE definition of the vanishing term order — used by the prover on the
evaluation grid (ints), the refimpl verifier at zeta (extension tuples), and
the TPU verifier at zeta (jnp lanes).  Term order mirrors plonky2
plonk::vanishing_poly::eval_vanishing_poly:

    [ Z-init terms (all challenges) ]
 ++ [ partial-product terms (all challenges, chunk order) ]
 ++ [ filtered gate-constraint terms (padded to num_gate_constraints) ]

folded per alpha as sum_i alpha^i * term_i (reduce_with_powers).
"""

from .gates import evaluate_gate_constraints


def eval_vanishing_terms(F, common, x, constants, sigmas, wires, zs, zs_next,
                         partial_products, pi_hash, betas, gammas, l0):
    """Returns the ordered list of vanishing terms at point `x`.

    constants: num_constants values (selectors ++ gate constants)
    sigmas:    num_routed_wires values
    zs/zs_next/partial_products: per plonky2 openings layout
    betas/gammas: base-field challenge ints; l0: L_0(x) in F.
    """
    cfg = common.config
    r = cfg.num_routed_wires
    q = common.quotient_degree_factor
    npp = common.num_partial_products
    one = F.one()

    z1_terms = [F.mul(l0, F.sub(zs[i], one)) for i in range(cfg.num_challenges)]

    pp_terms = []
    for i in range(cfg.num_challenges):
        beta = F.from_base(betas[i])
        gamma = F.from_base(gammas[i])
        # f_j = w_j + beta * k_j * x + gamma;  g_j = w_j + beta * sigma_j + gamma
        f = [F.add(F.add(wires[j],
                         F.mul(beta, F.mul(F.from_base(common.k_is[j]), x))),
                   gamma) for j in range(r)]
        g = [F.add(F.add(wires[j], F.mul(beta, sigmas[j])), gamma)
             for j in range(r)]
        accs = ([zs[i]]
                + partial_products[i * npp:(i + 1) * npp]
                + [zs_next[i]])
        for t in range(npp + 1):
            lo, hi = t * q, min((t + 1) * q, r)
            prod_f = one
            prod_g = one
            for j in range(lo, hi):
                prod_f = F.mul(prod_f, f[j])
                prod_g = F.mul(prod_g, g[j])
            pp_terms.append(F.sub(F.mul(accs[t + 1], prod_g),
                                  F.mul(accs[t], prod_f)))

    gate_terms = evaluate_gate_constraints(
        F, common.gates, common.selector_groups, None,
        constants, wires, pi_hash,
        common.num_gate_constraints, common.num_selectors)
    return z1_terms + pp_terms + gate_terms
