"""Deterministic 3-batch fixture scenario (FIXTURES.md §6).

Covers every SCD2 merge branch (insert / unchanged / changed / hard
delete), every movement class (new / reactivation / churn / upgrade /
downgrade / zero / no_change), the exact-EOM boundary, and the
late-restatement path.

Timeline (all accounts/subs tiny and hand-checkable):
- B1 @2024-01-15: ACC1..3; SUB1(ACC1, 2024-01-10, 100, open),
  SUB2(ACC2, 2024-01-20, 50, end=2024-02-29 exact EOM),
  SUB3(ACC3, trial, 0, open), SUB5(ACC1, 2024-02-01..2024-02-15, 30 —
  ends BEFORE Feb EOM, must contribute 0).
- B2 @2024-03-15: SUB1 mrr -> 120 (SCD2 close+insert; upgrade),
  SUB2 re-arrives unchanged (no new version), SUB4(ACC2, starts
  2024-04-01, 80 -> reactivation after SUB2's Feb end),
  SUB3 missing (hard delete), ACC3 missing (hard delete).
- B3 @2024-05-15: SUB1 gets end_date 2024-04-10 (churn in April —
  needs reprocess_months override to restate).
"""

from __future__ import annotations

import os

ACCOUNTS_HDR = "account_id,account_name,industry,country,signup_date,referral_source,plan_tier,seats,is_trial,churn_flag"
SUBS_HDR = "subscription_id,account_id,start_date,end_date,plan_tier,seats,mrr_amount,arr_amount,is_trial,upgrade_flag,downgrade_flag,churn_flag,billing_frequency,auto_renew_flag"
TICKETS_HDR = "ticket_id,account_id,submitted_at,closed_at,resolution_time_hours,priority,first_response_time_minutes,satisfaction_score,escalation_flag"

ACC1 = "ACC1,Acme Corp,DevTools,US,2024-01-05,organic,Pro,10,false,false"
ACC2 = "ACC2,Beta LLC,FinTech,UK,2024-01-10,ads,Basic,5,false,false"
ACC3 = "ACC3,Gamma Inc,EdTech,DE,2024-01-12,event,Basic,2,true,false"

SUB1_V1 = "SUB1,ACC1,2024-01-10,,Pro,10,100.0,1200.0,false,false,false,false,monthly,true"
SUB1_V2 = "SUB1,ACC1,2024-01-10,,Pro,12,120.0,1440.0,false,true,false,false,monthly,true"
SUB1_V3 = "SUB1,ACC1,2024-01-10,2024-04-10,Pro,12,120.0,1440.0,false,true,false,true,monthly,false"
SUB2 = "SUB2,ACC2,2024-01-20,2024-02-29,Basic,5,50.0,600.0,false,false,false,true,monthly,false"
SUB3 = "SUB3,ACC3,2024-01-05,,Basic,2,0.0,0.0,true,false,false,false,monthly,true"
SUB4 = "SUB4,ACC2,2024-04-01,,Pro,6,80.0,960.0,false,false,false,false,annual,true"
SUB5 = "SUB5,ACC1,2024-02-01,2024-02-15,Basic,3,30.0,360.0,false,false,false,true,monthly,false"

TICKETS_B1 = [
    "T1,ACC1,2024-01-11 10:00:00,2024-01-12 09:00:00,23.0,High,30.0,4.5,false",
    "T2,ACC2,2024-01-21 08:00:00,,-5.0,urgent,-10.0,,true",  # negatives -> NULL, open ticket
    "T3,ACC3, 2024-01-13 12:00:00,2024-01-13 18:00:00,6.0,low,15.0,3.0,false",
]

BATCHES = {
    "b1": {
        "ts": "2024-01-15 00:00:00",
        "accounts": [ACC1, ACC2, ACC3],
        "subscriptions": [SUB1_V1, SUB2, SUB3, SUB5],
        "support_tickets": TICKETS_B1,
    },
    "b2": {
        "ts": "2024-03-15 00:00:00",
        "accounts": [ACC1, ACC2],
        "subscriptions": [SUB1_V2, SUB2, SUB4],
        "support_tickets": TICKETS_B1,
    },
    "b3": {
        "ts": "2024-05-15 00:00:00",
        "accounts": [ACC1, ACC2],
        "subscriptions": [SUB1_V3, SUB2, SUB4],
        "support_tickets": TICKETS_B1,
    },
}


def write_batch(tmpdir: str, batch: str) -> str:
    """Write one batch's CSVs into tmpdir/<batch>/ and return the dir."""
    d = os.path.join(tmpdir, batch)
    os.makedirs(d, exist_ok=True)
    spec = BATCHES[batch]
    files = {
        "accounts.csv": (ACCOUNTS_HDR, spec["accounts"]),
        "subscriptions.csv": (SUBS_HDR, spec["subscriptions"]),
        "support_tickets.csv": (TICKETS_HDR, spec["support_tickets"]),
    }
    for name, (hdr, rows) in files.items():
        with open(os.path.join(d, name), "w") as f:
            f.write(hdr + "\n" + "\n".join(rows) + "\n")
    return d
