"""Command-line interface: ``sample``, ``collapse``, ``dot`` subcommands.

Mirrors the reference CLI surface (``cmd/root.go:163-250``) with the
same flags and derived defaults, plus TPU-specific knobs (micro-chains
per logical chain, platform selection, checkpointing).

    python -m grample_tpu.cli sample -m net.uai -s adaptive -d -o -a 4
    python -m grample_tpu.cli collapse -m net.uai
    python -m grample_tpu.cli dot -m net.uai
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("-v", "--verbose", action="store_true", help="verbose output")
    common.add_argument("-e", "--seed", type=int, default=0, help="random seed (<1: wall clock)")
    common.add_argument("-t", "--trace", default="", help="trace output file")
    common.add_argument(
        "--platform", default="", help="force JAX platform (cpu/tpu/axon); default: environment"
    )
    p = argparse.ArgumentParser(
        prog="grample-tpu",
        description="TPU-native Gibbs marginal inference for UAI discrete PGMs",
        parents=[common],
    )
    sub = p.add_subparsers(dest="command", required=True)

    s = sub.add_parser("sample", help="estimate marginals (the MAR task)", parents=[common])
    s.add_argument("-m", "--model", required=True, help="UAI model file")
    s.add_argument("-s", "--sampler", default="simple",
                   choices=["simple", "collapsed", "adaptive"])
    s.add_argument("-d", "--evidence", action="store_true",
                   help="apply evidence from <model>.evid")
    s.add_argument("-o", "--solution", action="store_true",
                   help="score against <model>.MAR (and .merlin.MAR if present)")
    s.add_argument("-b", "--burnin", type=int, default=-1,
                   help="burn-in in single-site samples (<0: 2000*vars)")
    s.add_argument("-w", "--cwin", type=int, default=0,
                   help="convergence window in samples (<=0: burnin)")
    s.add_argument("-c", "--chains", type=int, default=0,
                   help="logical chains / variant slots (<=0: 2)")
    s.add_argument("--vchains", type=int, default=64,
                   help="micro-chains per logical chain (TPU batch axis)")
    s.add_argument("-a", "--chainadds", type=int, default=1,
                   help="chains added per adaptation step")
    s.add_argument("-i", "--maxiters", type=int, default=0,
                   help="max site samples (0: unlimited)")
    s.add_argument("-x", "--maxsecs", type=float, default=300.0,
                   help="max runtime seconds")
    s.add_argument("--budget", default="sampling",
                   choices=("sampling", "wall"),
                   help="maxsecs bounds sampling time (compiles excluded,"
                        " comparable-effort default) or literal wall clock"
                        " (the reference --maxsecs contract)")
    s.add_argument("-p", "--experiment", action="store_true",
                   help="experiment mode: CSV time series into the trace file")
    s.add_argument("--addr", default="", help="monitor HTTP address, e.g. :8000")
    s.add_argument("--measure", default="hellinger",
                   choices=["hellinger", "js", "maxabs", "meanabs"])
    s.add_argument("--adapt-policy", default="worst", choices=["worst", "ref-tail"])
    s.add_argument("--no-warm-start", action="store_true",
                   help="uniform-init adaptive chains (reference behavior)")
    s.add_argument("--anneal", type=int, default=20, metavar="STAGES",
                   help="tempered burn-in stages (0 = plain uniform-init "
                        "burn, the reference behavior)")
    s.add_argument("--no-rb-mixture", action="store_true",
                   help="freeze collapsed-var marginals at collapse time "
                        "(reference behavior) instead of the RB mixture")
    s.add_argument("--mar-out", default="", help="write final MAR solution to file")
    s.add_argument("--checkpoint", default="", help="checkpoint file path")
    s.add_argument("--checkpoint-secs", type=float, default=60.0)
    s.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint if it exists (budgets continue)")
    s.add_argument("--mesh", default="off",
                   help="device mesh: off | auto | VxC (variants x chains), e.g. 2x4")
    s.add_argument("--split-group", default="auto", choices=("auto", "on", "off"),
                   help="adaptive split execution: Pallas plain slots + "
                        "reduced-chain XLA collapse slots (see sampler/split.py)")
    s.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed for multi-host runs")
    s.add_argument("--reserve", type=int, default=0,
                   help="pre-size variant slot capacity (avoids mid-run recompiles)")

    c = sub.add_parser("collapse", help="validate exact collapse per variable", parents=[common])
    c.add_argument("-m", "--model", required=True)
    c.add_argument("-d", "--evidence", action="store_true", default=True)

    d = sub.add_parser("dot", help="export the moral graph in Graphviz format", parents=[common])
    d.add_argument("-m", "--model", required=True)
    d.add_argument("-d", "--evidence", action="store_true")
    return p


def cmd_sample(args) -> int:
    if args.distributed:
        # multi-host: join the cluster before any device query.  On TPU
        # pods coordinator/process env is auto-detected; elsewhere set
        # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
        import jax

        jax.distributed.initialize()

    from grample_tpu.monitor import Monitor
    from grample_tpu.sampler.engine import Engine, EngineConfig

    cfg = EngineConfig(
        model_path=args.model,
        use_evidence=args.evidence,
        use_solution=args.solution,
        sampler=args.sampler,
        burnin=args.burnin,
        converge_window=args.cwin,
        chains=args.chains,
        chains_per_variant=args.vchains,
        chain_adds=args.chainadds,
        max_iters=args.maxiters,
        max_secs=args.maxsecs,
        budget=args.budget,
        seed=args.seed,
        measure=args.measure,
        adapt_policy=args.adapt_policy,
        warm_start=not args.no_warm_start,
        anneal_stages=args.anneal,
        rb_mixture=not args.no_rb_mixture,
        trace_path=args.trace,
        experiment=args.experiment,
        verbose=args.verbose,
        mar_out=args.mar_out,
        checkpoint_path=args.checkpoint,
        checkpoint_secs=args.checkpoint_secs,
        resume=args.resume,
        mesh=args.mesh,
        split_group=args.split_group,
        distributed=args.distributed,
        reserve_slots=args.reserve,
    )
    monitor = None
    if args.addr:
        monitor = Monitor(args.addr)
        monitor.start()
        print(f"monitor listening on :{monitor.port}/debug/vars")
    try:
        Engine(cfg, monitor=monitor).run()
    finally:
        if monitor:
            monitor.stop()
    return 0


def cmd_collapse(args) -> int:
    """Per-variable exact-collapse validation (reference cmd/collapse.go)."""
    import numpy as np

    from grample_tpu.metrics import error_suite
    from grample_tpu.metrics.divergences import pad_marginals
    from grample_tpu.sampler.collapse import collapse_var, is_collapsible
    from grample_tpu.uai import load_model, read_mar_file

    model = load_model(args.model, use_evidence=args.evidence)
    sol = pad_marginals(read_mar_file(args.model + ".MAR"), model.cards)
    merlin = None
    mp = args.model + ".merlin.MAR"
    if os.path.exists(mp):
        merlin = pad_marginals(read_mar_file(mp), model.cards)

    blankets = model.blankets()
    for i in range(model.num_vars):
        if model.fixed[i] >= 0:
            continue
        if not is_collapsible(model, i, blankets[i]):
            print(f"Var[{i}] {model.var_name(i)}: SKIPPED (blanket {len(blankets[i])})")
            continue
        _, exact = collapse_var(model, i)
        card = int(model.cards[i])
        est = np.zeros((model.num_vars, model.marginals.shape[1]))
        est[i, :card] = exact
        one = np.array([i])
        col_vs_sol = error_suite(est[one], sol[one], model.cards[one])
        print(f"Var[{i}] {model.var_name(i)} (card {card}, blanket {len(blankets[i])})")
        print(f"  collapsed: {np.round(exact, 6)}")
        print(f"  solution : {np.round(sol[i, :card], 6)}")
        print(f"  Col vs Sol: Hell={col_vs_sol.max_hellinger:.6f} JS={col_vs_sol.max_js:.6f}")
        if merlin is not None:
            mer_vs_sol = error_suite(merlin[one], sol[one], model.cards[one])
            mer_vs_col = error_suite(merlin[one], est[one], model.cards[one])
            print(f"  Mer vs Sol: Hell={mer_vs_sol.max_hellinger:.6f}"
                  f"  Mer vs Col: Hell={mer_vs_col.max_hellinger:.6f}")
    return 0


def cmd_dot(args) -> int:
    """Graphviz moral-graph export (reference cmd/dot.go:18-79)."""
    from grample_tpu.pgm.coloring import moral_adjacency
    from grample_tpu.uai import load_model

    model = load_model(args.model, use_evidence=args.evidence)
    adj = moral_adjacency(model.num_vars, [f.scope for f in model.factors])
    print("strict graph G {")
    for a in range(model.num_vars):
        for b in sorted(adj[a]):
            if b > a:
                print(f"    {model.var_name(a)} -- {model.var_name(b)};")
    print("}")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    if args.command == "sample":
        return cmd_sample(args)
    if args.command == "collapse":
        return cmd_collapse(args)
    if args.command == "dot":
        return cmd_dot(args)
    return 2


if __name__ == "__main__":
    sys.exit(main())
