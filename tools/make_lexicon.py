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
