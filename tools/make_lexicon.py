#!/usr/bin/env python3
"""Generate fixtures/sentiment_lexicon.tsv — an AFINN-style English polarity
wordlist (word<TAB>integer score in [-5, 5]), authored for this repo and
dedicated to the public domain. Same scale and file shape as the AFINN
lexicon so a user can drop in AFINN/VADER-derived files unchanged.

The 12 engine-domain overlay tokens used by the m7 query stand-ins
(fast/slow/big/... ) are deliberately EXCLUDED so the query-side union
never produces duplicate lexicon rows.
"""
import os

REVIEW_DOMAIN = {  # everyday review vocabulary (restaurants, products, service)
    3: """yummy scrumptious delectable mouthwatering heavenly divine
         flavorful savory succulent tender crispy juicy aromatic zesty
         artisanal gourmet authentic homemade generous-portion bargain
         five-star top-notch world-class standout gem favorite must-try
         spotless welcoming attentive knowledgeable prompt speedy courteous
         accommodating family-friendly cozy charming picturesque scenic
         vibrant lively bustling immersive unforgettable""",
    2: """tasty filling fresh-baked crunchy creamy buttery fluffy hearty
         wholesome seasonal organic local affordable reasonable spacious
         airy tidy quaint rustic homey intimate relaxing chill mellow
         family-run dog-friendly kid-friendly walkable convenient central
         reliable consistent punctual responsive professional thoughtful
         flexible transparent fair-priced well-made well-designed durable
         lightweight compact ergonomic intuitive user-friendly seamless
         speedy snappy responsive painless hassle-free straightforward
         well-stocked well-kept well-run well-lit smooth-running
         good-value solid-build long-lasting energy-efficient""",
    -2: """bland soggy greasy stale rubbery mushy watery overcooked
         undercooked burnt lukewarm cold-food salty oversalted oily
         tasteless flavorless cramped dingy dim grimy sticky smelly stuffy
         drafty noisy chaotic crowded overbooked understaffed inattentive
         forgetful dismissive curt brusque pushy overbearing slow-service
         long-wait overpriced pricey hidden-fees misleading flimsy fragile
         scratched dented defective malfunctioning buggy laggy glitchy
         clunky outdated obsolete incompatible unresponsive inconvenient
         confusing fiddly finicky temperamental unreliable short-lived
         cheaply-made poorly-made poorly-run mismanaged disorganized""",
    -3: """inedible rancid spoiled rotten moldy contaminated unsanitary
         filthy infested roach-infested hazardous unsafe hostile abusive
         scam ripoff fraudulent bait-and-switch false-advertising
         unusable broken-on-arrival dead-on-arrival dangerous""",
}

BUCKETS = {
    5: """outstanding superb breathtaking magnificent phenomenal exquisite
         flawless masterful miraculous sublime perfection ecstatic exhilarated
         overjoyed euphoric triumphant""",
    4: """excellent amazing wonderful fantastic brilliant awesome incredible
         marvelous spectacular stunning superior thrilled delighted fabulous
         exceptional splendid glorious dazzling captivating inspiring
         extraordinary heavenly irresistible majestic stellar sensational
         masterpiece winner jubilant blissful radiant love adore cherish
         treasure ecstasy euphoria delight rapture joyous elated heroic
         legendary revolutionary groundbreaking unbeatable priceless""",
    3: """great good happy joy beautiful gorgeous charming delicious
         delightful impressive admirable generous gracious honorable adorable
         affectionate appealing attractive blessed bright brilliant cheerful
         classy commendable compassionate confident courageous courteous
         creative dedicated dependable devoted dynamic eager earnest effective
         efficient elegant eloquent empowering enchanting encouraging
         energetic engaging enjoyable enthusiastic ethical excellent exciting
         faithful famous fascinating favorite fearless festive flourishing
         fortunate friendly fulfilling fun genius gentle genuine gifted
         graceful grateful gratifying handsome harmonious healthy heartfelt
         helpful honest hopeful hospitable humorous ideal imaginative
         impeccable important improved innovative insightful intelligent
         intuitive inventive invigorating keen kind knowledgeable laudable
         likable lively lovable lovely loyal lucid lucky memorable merciful
         merry meticulous mindful motivated neat noble nourishing nurturing
         optimistic orderly organized passionate patient peaceful perceptive
         persevering persistent playful pleasant pleased pleasing plentiful
         polished polite positive praiseworthy precious premium prepared
         pretty productive proficient profound prosperous proud punctual pure
         quaint radiant reasonable reassuring refined refreshing relaxed
         reliable remarkable resilient resourceful respectful responsible
         rewarding robust romantic satisfying secure serene sharp shiny
         sincere skillful smart smooth sociable soothing sophisticated
         sparkling spirited spontaneous steadfast stimulating strong
         successful supportive surprising sweet talented tasteful tender
         terrific thankful thorough thoughtful thriving tidy timely tolerant
         tranquil trusting trustworthy truthful upbeat uplifting valiant
         valuable versatile vibrant victorious vigilant virtuous visionary
         vivacious warm welcoming wholesome wise witty worthy zealous""",
    2: """nice fine pleasant agreeable decent fair solid stable steady
         suitable able abundant accessible acclaimed accomplished accurate
         achievement adaptable adequate advantage advantageous affirmative
         affordable agile alert alive ample appreciate appreciated approving
         apt artful assuring attentive authentic avid award balanced
         beneficial best better bonus boost calm capable celebrated
         celebration certain champion charitable civil clean clear clever
         comfort comfortable comforting competent complete compliment
         congratulations considerate consistent constructive content
         convenient cool cooperative correct cozy credible cute daring
         dashing dazzle defended definite deserving desirable determined
         dignified diligent diplomatic distinct distinguished diverse eased
         easier easy economical educated effortless elevate eminent empathy
         enable endorse endorsement enduring enhance enhanced enrich
         enriched enthusiasm equitable essential esteemed ethical even
         eventful evident exact exemplary expand expressive exuberant
         factual famous fancy fast-growing favor favorable feasible fertile
         fit fitting flexible fluent fond fresh fruitful functional funny
         gain generous gentle genuine glad glow golden goodwill grand
         gratitude growth guarantee guidance handy happiness hardy heal
         healing hearty helpful high-quality honor hope humble hygienic
         immaculate improve improving inclusive independent influential
         informative intact integral interesting inviting jolly jovial just
         justified lean legitimate liberty light likeable limitless logical
         lush luxurious mature meaningful mellow mend merit methodical
         modern modest moral natural neatly notable noted noteworthy
         nourish novel nutritious okay open opportune opportunity orderly
         paradise pardon peace perky permissible pertinent philanthropic
         picturesque pinnacle pleasurable plush poised popular portable
         practical pragmatic praise precise prefer preferable prestige
         prestigious prime principled privileged prize pro proactive
         probable progress progressive prominent promise promising prompt
         proper prosper protect proven prudent purposeful quality quick
         quiet ready receptive recommend recommended recover redeem
         refresh regal relevant relief relieve renew renowned repair
         reputable rescue respect restful restore revive rich right
         righteous rightful rosy safe salute sane satisfactory save savvy
         seamless seasoned select sensible sensitive settle significant
         simple skilled sleek slick snappy snug soft solidarity sound
         spacious spirited splendor spotless stainless strength striking
         sturdy stylish succeed success sufficient suitable sunny superb
         support supreme sure surely swift sympathy tactful tasty teachable
         team tempting tenacious thrift thrive tight-knit top tops tough
         traditional treat triumph truce true trust unbiased unified unique
         united unity unquestionable untouched upgrade uphold upright
         upward useful usable validated viable vivid vouch wealth welcome
         well wellbeing whole willing win wins wisdom wonder workable
         worthwhile""",
    1: """ok acceptable adequate alright average calm casual common curious
         eager earnest eventual gradual hope hopeful interested intrigued
         keen neutral-positive normal passable presentable routine salvage
         spare steady sufficient tolerable tolerant usable wishful""",
    -1: """annoying awkward bland boring bothersome clumsy confused dull
         flat forgettable hesitant inconvenient lacking lukewarm mediocre
         messy mundane odd ordinary overdue plain questionable rough slowly
         sluggish stale tedious tired tolerably uncertain unclear uneasy
         unsure vague weary""",
    -2: """bad sad angry upset annoyed bitter bleak broke burden careless
         cheap clash complain complaint concern concerned conflict confuse
         costly crack cramped crude cynical damp danger dark deceive
         decline defect deficient dent deny dirty disagree disappoint
         discomfort discourage dishonest dislike dismal disorder dispute
         disrupt distract distress disturb doubt doubtful downcast drag
         drain dreary err error excess excuse fail failing fake fault
         faulty fear flaw flimsy fool foolish forget fragile fret frown
         frustrate glitch gloom gloomy grief grim gripe grudge guilt
         harsh hassle hinder hostile hurt idle ignore ill illogical
         impatient impede imperfect impolite improper inaccurate inadequate
         incomplete inconsistent incorrect inefficient inferior inflexible
         insecure insult interfere irregular irritate jaded jealous lag
         lame lapse late lazy leak lessen liability limp lose loss lost
         loud low mess mislead mistake mistrust misunderstand moan mock
         murky neglect negative nervous noise noisy object objection odd
         offend old-fashioned oppose overpriced panic pain pity poor
         pressure problem protest quarrel rash refuse regret reject rigid
         risk risky rude ruin rust scare scratch shabby shaky shame
         shortage shortcoming skeptical sloppy spoil stagnant stall
         strain strange stress strict struggle stubborn stuck subpar
         suspect suspicious tangle tense threat tired trouble unclean
         uncomfortable unfair unfit unfortunate unhappy unhelpful unlucky
         unpleasant unreliable unstable untidy unwanted unwelcome upset
         vain weak weaken worn worried worry wrong""",
    -3: """awful terrible horrible dreadful severe abuse abusive afraid
         aggravate aggressive alarm alarming anger anguish arrogant
         ashamed attack betray bias bitter blame bogus breakdown broken
         brutal careless chaos cheat collapse condemn contempt corrupt
         coward crash crisis critical cruel crush damage damaging deceit
         deceptive defeat defective deplete depress depressed desperate
         despise destroy destructive dire disaster disastrous disgrace
         dishonor dismay disrespect distrust dread dreadful enrage envy
         erode exhaust exploit fail failure fraud fraudulent frighten
         furious greed greedy grave harm harmful hate hateful havoc
         helpless hopeless horrid humiliate ignorant immoral inept
         infuriate insufferable intolerable jeopardize lie liar malice
         menace miserable misery mourn nasty obnoxious offensive outrage
         painful pathetic peril pessimistic poison rage reckless resent
         revolt ridicule ruthless savage scandal scorn selfish severe
         shameful shatter shock sinister smear spite steal stern stink
         suffer terrify threaten torment toxic tragedy tragic trauma
         unacceptable unbearable unethical unforgivable untrustworthy
         useless vicious vile violate violent wicked worthless wreck""",
    -4: """atrocious abysmal appalling catastrophic devastating horrific
         horrendous despicable detestable disgusting repulsive revolting
         sickening vulgar heinous monstrous nightmare agonizing excruciating
         unbearable insufferable loathsome repugnant abhorrent odious
         grotesque ghastly hideous lousy diabolical depraved barbaric
         merciless sadistic treacherous tyrannical villainous malicious
         malevolent catastrophe apocalypse ruinous torturous""",
    -5: """abominable unspeakable unforgivable genocidal murderous satanic
         hellish damnation torture massacre atrocity""",
}

# Inflected families: verb/adjective stems scored once, listed with their
# real English inflections (explicitly curated — no mechanical suffixing,
# which would mint non-words).
FAMILIES = {
    3: ["love loves loved loving", "enjoy enjoys enjoyed enjoying",
        "admire admires admired admiring", "delight delights delighted",
        "impress impresses impressed impressive",
        "succeed succeeds succeeded succeeding",
        "flourish flourishes flourished flourishing",
        "celebrate celebrates celebrated celebrating",
        "praise praises praised praising", "excel excels excelled excelling",
        "amaze amazes amazed amazing", "charm charms charmed charming",
        "inspire inspires inspired inspiring",
        "thrill thrills thrilling", "win winning",
        "recommend recommends recommended recommending",
        "satisfy satisfies satisfied satisfying"],
    2: ["help helps helped helping", "improve improves improved improving",
        "like likes liked liking", "thank thanks thanked thanking",
        "agree agrees agreed agreeing", "benefit benefits benefited",
        "achieve achieves achieved achieving",
        "appreciate appreciates appreciated appreciating",
        "approve approves approved approving",
        "encourage encourages encouraged encouraging",
        "support supports supported supporting",
        "protect protects protected protecting",
        "repair repairs repaired repairing",
        "resolve resolves resolved resolving",
        "restore restores restored restoring",
        "reward rewards rewarded rewarding",
        "share shares shared sharing", "smile smiles smiled smiling",
        "laugh laughs laughed laughing", "heal heals healed healing",
        "grow grows growing grew", "gain gains gained gaining",
        "care cares cared caring", "trust trusts trusted trusting",
        "respect respects respected respecting",
        "refresh refreshes refreshed refreshing",
        "strengthen strengthens strengthened strengthening"],
    -2: ["fail fails failing", "break breaks breaking broke",
         "lose loses losing", "worry worries worried worrying",
         "annoy annoys annoyed", "complain complains complained complaining",
         "disappoint disappoints disappointing",
         "confuse confuses confusing", "doubt doubts doubted doubting",
         "struggle struggles struggled struggling",
         "decline declines declined declining",
         "neglect neglects neglected neglecting",
         "ignore ignores ignored ignoring", "blame blames blamed blaming",
         "regret regrets regretted regretting",
         "reject rejects rejected rejecting",
         "refuse refuses refused refusing", "delay delays delayed delaying",
         "damage damages damaged damaging", "hurt hurts hurting",
         "weaken weakens weakened weakening", "spoil spoils spoiled spoiling",
         "leak leaks leaked leaking", "crack cracks cracked cracking",
         "stumble stumbles stumbled stumbling",
         "misbehave misbehaves misbehaved misbehaving"],
    -3: ["hate hates hated hating", "destroy destroys destroyed destroying",
         "betray betrays betrayed betraying",
         "deceive deceives deceived deceiving",
         "abuse abuses abused abusing", "attack attacks attacked attacking",
         "threaten threatens threatened threatening",
         "terrify terrifies terrified terrifying",
         "suffer suffers suffered suffering",
         "ruin ruins ruined ruining", "despise despises despised despising",
         "humiliate humiliates humiliated humiliating",
         "infuriate infuriates infuriated infuriating",
         "collapse collapses collapsed collapsing",
         "crash crashes crashed crashing",
         "torment torments tormented tormenting",
         "exploit exploits exploited exploiting",
         "poison poisons poisoned poisoning",
         "corrupt corrupts corrupted corrupting",
         "shatter shatters shattered shattering"],
    -4: ["devastate devastates devastated devastating",
         "traumatize traumatizes traumatized traumatizing",
         "terrorize terrorizes terrorized terrorizing",
         "torture tortures tortured torturing",
         "massacre massacres massacred",
         "annihilate annihilates annihilated annihilating"],
}

# overlay tokens owned by the m7 query's domain stand-in — keep them OUT
EXCLUDE = {"fast", "slow", "big", "small", "dup", "merge", "join", "filter",
           "sort", "stream", "batch", "hash"}


def main():
    os.makedirs("fixtures", exist_ok=True)
    entries = {}
    for score, words in BUCKETS.items():
        for w in words.split():
            w = w.strip().lower()
            if not w or w in EXCLUDE:
                continue
            # first (strongest-listed) bucket wins on accidental repeats
            if w not in entries or abs(score) > abs(entries[w]):
                entries[w] = score
    for score, words in REVIEW_DOMAIN.items():
        for w in words.split():
            w = w.strip().lower()
            if not w or w in EXCLUDE:
                continue
            if w not in entries or abs(score) > abs(entries[w]):
                entries[w] = score
    for score, fams in FAMILIES.items():
        for fam in fams:
            for w in fam.split():
                w = w.strip().lower()
                if not w or w in EXCLUDE:
                    continue
                if w not in entries or abs(score) > abs(entries[w]):
                    entries[w] = score
    with open("fixtures/sentiment_lexicon.tsv", "w") as f:
        f.write("word\tscore\n")
        for w in sorted(entries):
            f.write(f"{w}\t{entries[w]}\n")
    from collections import Counter
    dist = Counter(entries.values())
    print(f"wrote fixtures/sentiment_lexicon.tsv: {len(entries)} words, "
          f"score distribution {dict(sorted(dist.items()))}")


if __name__ == "__main__":
    main()
