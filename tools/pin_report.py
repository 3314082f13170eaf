"""Assemble PINS_r05.jsonl from raw --registered runs (VERDICT r4 #3).

Evaluates TWO readings per protocol and records both verdicts:

  * rule_v1 (pre-registered, accuracy_pin.REGISTERED_RULE): by-loss
    finals <= 0.001 AND shipped transient max <= max(0.005, control
    transient envelope).
  * control_consistency: does the CONTROL arm itself (f32 Pallas vs f32
    XLA — reduction-order-only, zero reduced precision) satisfy rule
    v1's absolute by-loss clause?  If not, rule v1 is falsified by its
    own yardstick on that protocol (an order-only perturbation cannot
    be a stack bug), and the meaningful comparison is shipped-vs-control
    per indicator — reported as rule_v2: every indicator's shipped
    envelope <= max(strict, control envelope), strict = 0.005 transient
    / 0.001 by-loss-final.

Usage: python tools/pin_report.py RAW.jsonl [RAW2.jsonl ...] > PINS.jsonl
"""
import json
import sys


def main():
    rows = []
    for path in sys.argv[1:]:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    seeds = {}
    for r in rows:
        if "registered_pin_seed" in r:
            s = r["registered_pin_seed"]
            seeds.setdefault(s["protocol"], {})[s["seed"]] = s

    for proto, per_seed in seeds.items():
        sv = list(per_seed.values())
        env_t = max(r["control"]["max_abs"] for r in sv)
        env_b = max(r["control"]["by_loss_final"] for r in sv)
        ship_t = max(r["shipped"]["max_abs"] for r in sv)
        ship_b = max(r["shipped"]["by_loss_final"] for r in sv)
        v1 = ship_b <= 0.001 and ship_t <= max(0.005, env_t)
        control_consistent = env_b <= 0.001
        v2 = ship_t <= max(0.005, env_t) and ship_b <= max(0.001, env_b)
        print(json.dumps({
            "metric": "registered_accuracy_pin",
            "protocol": proto,
            "seeds": sorted(per_seed),
            "pass_rule_v1": bool(v1),
            "control_satisfies_v1_by_loss_clause": bool(control_consistent),
            "pass_rule_v2_control_relative": bool(v2),
            "shipped_transient_max": ship_t,
            "control_transient_envelope": env_t,
            "shipped_by_loss_final_max": ship_b,
            "control_by_loss_final_envelope": env_b,
            "per_seed": {
                str(k): {"shipped": v["shipped"], "control": v["control"]}
                for k, v in sorted(per_seed.items())
            },
        }))


if __name__ == "__main__":
    main()
