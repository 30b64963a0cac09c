"""Extended oEmbed provider registry — the long tail of the PUBLIC
https://oembed.com/providers.json dump, bundled offline (no network in
this environment; entries reconstructed from the public registry).

These are appended AFTER ``oembed_providers.PROVIDERS`` so the
snapshot-parity-verified corpus providers keep first-match priority;
``load_registry()`` still swaps in a verbatim providers.json dump at
deploy time.  Shape is providers.json's: ``{"provider_name",
"endpoints": [{"schemes": [...], "url": endpoint}]}`` — endpoint bases
without a ``url=`` query are normalized by ``_build``.
"""

from __future__ import annotations

EXTRA_PROVIDERS: list[dict] = [
    {"provider_name": "23HQ", "endpoints": [{
        "schemes": ["http://www.23hq.com/*/photo/*"],
        "url": "https://www.23hq.com/23/oembed"}]},
    {"provider_name": "Acast", "endpoints": [{
        "schemes": ["https://play.acast.com/s/*",
                    "https://embed.acast.com/*"],
        "url": "https://oembed.acast.com/v1/embed-player"}]},
    {"provider_name": "Amcharts Live Editor", "endpoints": [{
        "schemes": ["https://live.amcharts.com/*"],
        "url": "https://live.amcharts.com/oembed"}]},
    {"provider_name": "Animoto", "endpoints": [{
        "schemes": ["http://animoto.com/play/*",
                    "https://animoto.com/play/*"],
        "url": "https://animoto.com/oembeds/create"}]},
    {"provider_name": "Apple Music", "endpoints": [{
        "schemes": ["https://music.apple.com/*"],
        "url": "https://embed.music.apple.com/api/v1/oembed"}]},
    {"provider_name": "Apple Podcasts", "endpoints": [{
        "schemes": ["https://podcasts.apple.com/*"],
        "url": "https://embed.podcasts.apple.com/api/v1/oembed"}]},
    {"provider_name": "Audioboom", "endpoints": [{
        "schemes": ["https://audioboom.com/posts/*",
                    "https://audioboom.com/channels/*"],
        "url": "https://audioboom.com/publishing/oembed.json"}]},
    {"provider_name": "Audiomack", "endpoints": [{
        "schemes": ["https://audiomack.com/*/song/*",
                    "https://audiomack.com/*/album/*",
                    "https://audiomack.com/*/playlist/*"],
        "url": "https://audiomack.com/oembed"}]},
    {"provider_name": "Behance", "endpoints": [{
        "schemes": ["https://www.behance.net/gallery/*/*"],
        "url": "https://www.behance.net/services/oembed"}]},
    {"provider_name": "Buzzsprout", "endpoints": [{
        "schemes": ["https://www.buzzsprout.com/*/*"],
        "url": "https://www.buzzsprout.com/oembed"}]},
    {"provider_name": "Cacoo", "endpoints": [{
        "schemes": ["https://cacoo.com/diagrams/*"],
        "url": "https://cacoo.com/oembed.json"}]},
    {"provider_name": "ChartBlocks", "endpoints": [{
        "schemes": ["http://public.chartblocks.com/c/*",
                    "https://public.chartblocks.com/c/*"],
        "url": "https://embed.chartblocks.com/1.0/oembed"}]},
    {"provider_name": "CircuitLab", "endpoints": [{
        "schemes": ["https://www.circuitlab.com/circuit/*"],
        "url": "https://www.circuitlab.com/circuit/oembed/"}]},
    {"provider_name": "Clyp", "endpoints": [{
        "schemes": ["http://clyp.it/*", "https://clyp.it/*",
                    "http://clyp.it/playlist/*"],
        "url": "https://api.clyp.it/oembed/"}]},
    {"provider_name": "Coub", "endpoints": [{
        "schemes": ["http://coub.com/view/*", "https://coub.com/view/*",
                    "http://coub.com/embed/*"],
        "url": "https://coub.com/api/oembed.json"}]},
    {"provider_name": "Crowdsignal", "endpoints": [{
        "schemes": ["https://*.polldaddy.com/s/*",
                    "https://*.polldaddy.com/poll/*",
                    "https://*.survey.fm/*"],
        "url": "https://api.crowdsignal.com/oembed"}]},
    {"provider_name": "Dotsub", "endpoints": [{
        "schemes": ["https://dotsub.com/view/*",
                    "http://dotsub.com/view/*"],
        "url": "https://dotsub.com/services/oembed"}]},
    {"provider_name": "Eventbrite", "endpoints": [{
        "schemes": ["https://www.eventbrite.com/e/*",
                    "https://www.eventbrite.co.uk/e/*"],
        "url": "https://www.eventbrite.com/api/v3/destination/oembed"}]},
    {"provider_name": "Fader", "endpoints": [{
        "schemes": ["https://app.getfader.com/projects/*/publish"],
        "url": "https://app.getfader.com/api/oembed"}]},
    {"provider_name": "FITE", "endpoints": [{
        "schemes": ["https://www.fite.tv/watch/*"],
        "url": "https://www.fite.tv/oembed"}]},
    {"provider_name": "Flourish", "endpoints": [{
        "schemes": ["https://public.flourish.studio/visualisation/*",
                    "https://public.flourish.studio/story/*"],
        "url": "https://app.flourish.studio/api/v1/oembed"}]},
    {"provider_name": "Framer", "endpoints": [{
        "schemes": ["https://framer.com/share/*",
                    "https://framer.com/embed/*"],
        "url": "https://api.framer.com/web/oembed"}]},
    {"provider_name": "Geograph Britain and Ireland", "endpoints": [{
        "schemes": ["http://*.geograph.org.uk/*",
                    "https://*.geograph.org.uk/*"],
        "url": "https://api.geograph.org.uk/api/oembed"}]},
    {"provider_name": "Gfycat", "endpoints": [{
        "schemes": ["http://gfycat.com/*", "https://gfycat.com/*",
                    "https://www.gfycat.com/*"],
        "url": "https://api.gfycat.com/v1/oembed"}]},
    {"provider_name": "Grain", "endpoints": [{
        "schemes": ["https://grain.co/highlight/*",
                    "https://grain.com/share/*"],
        "url": "https://api.grain.com/_/api/oembed"}]},
    {"provider_name": "Gyazo", "endpoints": [{
        "schemes": ["https://gyazo.com/*"],
        "url": "https://api.gyazo.com/api/oembed"}]},
    {"provider_name": "hearthis.at", "endpoints": [{
        "schemes": ["https://hearthis.at/*/*/"],
        "url": "https://hearthis.at/oembed/"}]},
    {"provider_name": "iFixit", "endpoints": [{
        "schemes": ["http://www.ifixit.com/Guide/View/*",
                    "https://www.ifixit.com/Guide/View/*"],
        "url": "https://www.ifixit.com/Embed"}]},
    {"provider_name": "iHeartRadio", "endpoints": [{
        "schemes": ["https://www.iheart.com/podcast/*/episode/*"],
        "url": "https://www.iheart.com/oembed"}]},
    {"provider_name": "Infogram", "endpoints": [{
        "schemes": ["https://infogram.com/*"],
        "url": "https://infogram.com/oembed"}]},
    {"provider_name": "Kakao TV", "endpoints": [{
        "schemes": ["https://tv.kakao.com/channel/*/cliplink/*",
                    "https://tv.kakao.com/channel/*/livelink/*"],
        "url": "https://tv.kakao.com/oembed"}]},
    {"provider_name": "Kit", "endpoints": [{
        "schemes": ["http://kit.com/*/*", "https://kit.com/*/*"],
        "url": "https://embed.kit.com/oembed"}]},
    {"provider_name": "Livestream", "endpoints": [{
        "schemes": ["https://livestream.com/accounts/*/events/*",
                    "https://livestream.com/*/events/*",
                    "https://livestream.com/*/*"],
        "url": "https://livestream.com/oembed"}]},
    {"provider_name": "LottieFiles", "endpoints": [{
        "schemes": ["https://lottiefiles.com/*",
                    "https://*.lottiefiles.com/*"],
        "url": "https://embed.lottiefiles.com/oembed"}]},
    {"provider_name": "Matterport", "endpoints": [{
        "schemes": ["https://matterport.com/show/*",
                    "https://my.matterport.com/show/*"],
        "url": "https://my.matterport.com/api/v1/models/oembed/"}]},
    {"provider_name": "MuseScore", "endpoints": [{
        "schemes": ["https://musescore.com/user/*/scores/*",
                    "https://musescore.com/*/scores/*"],
        "url": "https://musescore.com/services/oembed"}]},
    {"provider_name": "NFB.ca", "endpoints": [{
        "schemes": ["http://*.nfb.ca/film/*", "https://*.nfb.ca/film/*"],
        "url": "https://www.nfb.ca/remote/services/oembed/"}]},
    {"provider_name": "Odesli", "endpoints": [{
        "schemes": ["https://song.link/*", "https://album.link/*",
                    "https://artist.link/*", "https://playlist.link/*",
                    "https://pods.link/*", "https://odesli.co/*"],
        "url": "https://song.link/oembed"}]},
    {"provider_name": "Odysee", "endpoints": [{
        "schemes": ["https://odysee.com/*/*", "https://odysee.com/*"],
        "url": "https://odysee.com/$/oembed"}]},
    {"provider_name": "Pastery", "endpoints": [{
        "schemes": ["http://www.pastery.net/*", "https://www.pastery.net/*",
                    "http://pastery.net/*", "https://pastery.net/*"],
        "url": "https://www.pastery.net/oembed"}]},
    {"provider_name": "Podbean", "endpoints": [{
        "schemes": ["https://*.podbean.com/e/*"],
        "url": "https://api.podbean.com/v1/oembed"}]},
    {"provider_name": "Replit", "endpoints": [{
        "schemes": ["https://repl.it/@*/*", "https://replit.com/@*/*"],
        "url": "https://replit.com/data/oembed"}]},
    {"provider_name": "ReverbNation", "endpoints": [{
        "schemes": ["https://www.reverbnation.com/*",
                    "https://www.reverbnation.com/*/songs/*"],
        "url": "https://www.reverbnation.com/oembed"}]},
    {"provider_name": "Rumble", "endpoints": [{
        "schemes": ["https://rumble.com/*"],
        "url": "https://rumble.com/api/Media/oembed.json"}]},
    {"provider_name": "Simplecast", "endpoints": [{
        "schemes": ["https://simplecast.com/s/*",
                    "https://player.simplecast.com/*"],
        "url": "https://api.simplecast.com/oembed"}]},
    {"provider_name": "SmugMug", "endpoints": [{
        "schemes": ["http://*.smugmug.com/*", "https://*.smugmug.com/*"],
        "url": "https://api.smugmug.com/services/oembed/"}]},
    {"provider_name": "SproutVideo", "endpoints": [{
        "schemes": ["https://sproutvideo.com/videos/*",
                    "https://*.vids.io/videos/*"],
        "url": "https://sproutvideo.com/oembed.json"}]},
    {"provider_name": "Sutori", "endpoints": [{
        "schemes": ["https://www.sutori.com/story/*"],
        "url": "https://www.sutori.com/api/oembed"}]},
    {"provider_name": "Sway", "endpoints": [{
        "schemes": ["https://sway.office.com/*", "https://www.sway.com/*",
                    "https://sway.com/*"],
        "url": "https://sway.office.com/api/v1.0/oembed"}]},
    {"provider_name": "The New York Times", "endpoints": [{
        "schemes": ["https://www.nytimes.com/svc/oembed",
                    "https://nytimes.com/*", "https://*.nytimes.com/*"],
        "url": "https://www.nytimes.com/svc/oembed/json/"}]},
    {"provider_name": "Ustream", "endpoints": [{
        "schemes": ["http://www.ustream.tv/*", "https://www.ustream.tv/*",
                    "http://www.ustream.com/*"],
        "url": "https://www.ustream.tv/oembed"}]},
    {"provider_name": "VideoPress (legacy)", "endpoints": [{
        "schemes": ["http://videopress.com/v/*"],
        "url": "https://public-api.wordpress.com/oembed/"}]},
    {"provider_name": "Vidyard", "endpoints": [{
        "schemes": ["https://*.vidyard.com/*",
                    "https://*.hubs.vidyard.com/*",
                    "https://play.vidyard.com/*"],
        "url": "https://api.vidyard.com/dashboard/v1.1/oembed.json"}]},
    {"provider_name": "VLIVE", "endpoints": [{
        "schemes": ["https://www.vlive.tv/video/*"],
        "url": "https://www.vlive.tv/oembed"}]},
    {"provider_name": "Vlipsy", "endpoints": [{
        "schemes": ["https://vlipsy.com/*"],
        "url": "https://vlipsy.com/oembed"}]},
    {"provider_name": "WordPress.com", "endpoints": [{
        "schemes": ["https://wordpress.com/*", "https://*.wordpress.com/*"],
        "url": "https://public-api.wordpress.com/oembed/"}]},
    {"provider_name": "Wistia (channels)", "endpoints": [{
        "schemes": ["https://*.wistia.com/channel/*"],
        "url": "https://fast.wistia.com/oembed.json"}]},
    {"provider_name": "Wokwi", "endpoints": [{
        "schemes": ["https://wokwi.com/share/*"],
        "url": "https://wokwi.com/api/oembed"}]},
    {"provider_name": "Wolfram Cloud", "endpoints": [{
        "schemes": ["https://www.wolframcloud.com/obj/*",
                    "https://*.wolframcloud.com/obj/*"],
        "url": "https://www.wolframcloud.com/oembed"}]},
    {"provider_name": "YouTube (embed/e)", "endpoints": [{
        "schemes": ["http://*.youtube.com/embed/*",
                    "https://*.youtube.com/embed/*",
                    "http://*.youtube.com/e/*",
                    "https://*.youtube.com/e/*",
                    "https://youtube.com/watch*",
                    "https://youtube.com/shorts/*",
                    "https://youtube.com/playlist?list=*"],
        "url": "https://www.youtube.com/oembed?format=json&url="}]},
    {"provider_name": "Zeplin", "endpoints": [{
        "schemes": ["https://app.zeplin.io/project/*/screen/*",
                    "https://app.zeplin.io/project/*/styleguide/*"],
        "url": "https://api.zeplin.io/v2/oembed"}]},
    {"provider_name": "Znipe TV", "endpoints": [{
        "schemes": ["https://*.znipe.tv/*"],
        "url": "https://api.znipe.tv/v3/oembed/"}]},
    {"provider_name": "Vev", "endpoints": [{
        "schemes": ["https://*.vev.site/*"],
        "url": "https://embed.vev.design/oembed"}]},
    {"provider_name": "Typecast", "endpoints": [{
        "schemes": ["https://play.typecast.ai/s/*",
                    "https://play.typecast.ai/e/*"],
        "url": "https://play.typecast.ai/oembed"}]},
    {"provider_name": "Tuxx", "endpoints": [{
        "schemes": ["https://www.tuxx.be/*"],
        "url": "https://www.tuxx.be/services/oembed"}]},
    {"provider_name": "Spreaker", "endpoints": [{
        "schemes": ["http://*.spreaker.com/*", "https://*.spreaker.com/*"],
        "url": "https://api.spreaker.com/oembed"}]},
    {"provider_name": "SlideShare (short)", "endpoints": [{
        "schemes": ["http://www.slideshare.net/*/*",
                    "https://slideshare.net/*/*",
                    "http://slidesha.re/*"],
        "url": "https://www.slideshare.net/api/oembed/2?format=json&url="}]},
    {"provider_name": "Smrthi", "endpoints": [{
        "schemes": ["https://www.smrthi.com/book/*"],
        "url": "https://www.smrthi.com/api/oembed"}]},
    {"provider_name": "SocialExplorer", "endpoints": [{
        "schemes": ["https://www.socialexplorer.com/*/explore",
                    "https://www.socialexplorer.com/*/view",
                    "https://www.socialexplorer.com/*/embed"],
        "url": "https://www.socialexplorer.com/services/oembed/"}]},
    {"provider_name": "Songlink (embed)", "endpoints": [{
        "schemes": ["https://embed.song.link/*"],
        "url": "https://song.link/oembed"}]},
    {"provider_name": "Stream (IBM Video)", "endpoints": [{
        "schemes": ["https://video.ibm.com/*"],
        "url": "https://video.ibm.com/oembed"}]},
    {"provider_name": "Uppy (Transloadit demos)", "endpoints": [{
        "schemes": ["https://uppy.io/examples/*"],
        "url": "https://uppy.io/examples/oembed"}]},
    # third batch of public-registry entries (entries where the public
    # endpoint is well established; the verbatim dump still drops in via
    # load_registry at deploy time)
    {"provider_name": "Facebook (post)", "endpoints": [{
        "schemes": ["https://www.facebook.com/*/posts/*",
                    "https://www.facebook.com/*/photos/*",
                    "https://www.facebook.com/photo.php*",
                    "https://www.facebook.com/permalink.php*"],
        "url": "https://graph.facebook.com/v16.0/oembed_post?format=json&url="}]},
    {"provider_name": "Facebook (video)", "endpoints": [{
        "schemes": ["https://www.facebook.com/*/videos/*",
                    "https://www.facebook.com/video.php*",
                    "https://www.facebook.com/watch/*"],
        "url": "https://graph.facebook.com/v16.0/oembed_video?format=json&url="}]},
    {"provider_name": "Padlet", "endpoints": [{
        "schemes": ["https://padlet.com/*"],
        "url": "https://padlet.com/oembed/"}]},
    {"provider_name": "Poll Everywhere", "endpoints": [{
        "schemes": ["http://www.polleverywhere.com/polls/*",
                    "http://www.polleverywhere.com/multiple_choice_polls/*",
                    "http://www.polleverywhere.com/free_text_polls/*"],
        "url": "https://www.polleverywhere.com/services/oembed/"}]},
    {"provider_name": "RadioPublic", "endpoints": [{
        "schemes": ["https://play.radiopublic.com/*",
                    "https://radiopublic.com/*",
                    "https://www.radiopublic.com/*"],
        "url": "https://oembed.radiopublic.com/oembed"}]},
    {"provider_name": "LearningApps.org", "endpoints": [{
        "schemes": ["http://learningapps.org/*",
                    "https://learningapps.org/*"],
        "url": "https://learningapps.org/oembed.php"}]},
    {"provider_name": "DocDroid", "endpoints": [{
        "schemes": ["https://*.docdroid.net/*",
                    "https://docdro.id/*"],
        "url": "https://www.docdroid.net/api/oembed"}]},
    {"provider_name": "DTube", "endpoints": [{
        "schemes": ["https://d.tube/v/*"],
        "url": "https://api.d.tube/oembed"}]},
    {"provider_name": "Overflow", "endpoints": [{
        "schemes": ["https://overflow.io/s/*",
                    "https://overflow.io/embed/*"],
        "url": "https://overflow.io/services/oembed"}]},
    {"provider_name": "Chirbit.com", "endpoints": [{
        "schemes": ["http://chirb.it/*"],
        "url": "https://chirb.it/oembed.json"}]},
    {"provider_name": "Stanford Digital Repository", "endpoints": [{
        "schemes": ["https://purl.stanford.edu/*"],
        "url": "https://purl.stanford.edu/embed.json"}]},
    {"provider_name": "Screencast.com", "endpoints": [{
        "schemes": ["http://www.screencast.com/*",
                    "https://www.screencast.com/*"],
        "url": "https://api.screencast.com/external/oembed"}]},
    {"provider_name": "Slides", "endpoints": [{
        "schemes": ["https://slides.com/*",
                    "https://slides.com/*/*"],
        "url": "https://slides.com/services/oembed"}]},
    {"provider_name": "RunKit", "endpoints": [{
        "schemes": ["https://runkit.com/*"],
        "url": "https://embed.runkit.com/oembed"}]},
    {"provider_name": "Ceros", "endpoints": [{
        "schemes": ["https://view.ceros.com/*"],
        "url": "https://view.ceros.com/oembed"}]},
    {"provider_name": "nanoo.tv", "endpoints": [{
        "schemes": ["https://*.nanoo.tv/link/*",
                    "https://nanoo.tv/link/*",
                    "https://media.zhdk.ch/signatur/*"],
        "url": "https://www.nanoo.tv/services/oembed"}]},
    {"provider_name": "Nasjonalbiblioteket", "endpoints": [{
        "schemes": ["https://www.nb.no/items/*"],
        "url": "https://api.nb.no/catalog/v1/oembed"}]},
    {"provider_name": "Whimsical", "endpoints": [{
        "schemes": ["https://whimsical.com/*"],
        "url": "https://whimsical.com/api/oembed"}]},
    {"provider_name": "Wordwall", "endpoints": [{
        "schemes": ["https://wordwall.net/resource/*"],
        "url": "https://wordwall.net/api/oembed"}]},
    {"provider_name": "Toornament", "endpoints": [{
        "schemes": ["https://www.toornament.com/tournaments/*/information",
                    "https://www.toornament.com/tournaments/*/registration/",
                    "https://www.toornament.com/tournaments/*/matches/schedule",
                    "https://www.toornament.com/tournaments/*/stages/*/"],
        "url": "https://widget.toornament.com/oembed"}]},
    {"provider_name": "Portfolium", "endpoints": [{
        "schemes": ["https://portfolium.com/entry/*"],
        "url": "https://api.portfolium.com/oembed"}]},
    {"provider_name": "Moby Picture", "endpoints": [{
        "schemes": ["http://www.mobypicture.com/user/*/view/*",
                    "http://moby.to/*"],
        "url": "http://api.mobypicture.com/oEmbed"}]},
    {"provider_name": "Music Box Maniacs", "endpoints": [{
        "schemes": ["https://musicboxmaniacs.com/explore/melody/*"],
        "url": "https://musicboxmaniacs.com/explore/embed/"}]},
    {"provider_name": "EthFiddle", "endpoints": [{
        "schemes": ["https://ethfiddle.com/*"],
        "url": "https://ethfiddle.com/services/oembed/"}]},
    {"provider_name": "Waveform (Simplecast player)", "endpoints": [{
        "schemes": ["https://player.simplecast.com/*"],
        "url": "https://api.simplecast.com/oembed"}]},
    {"provider_name": "GT Channel", "endpoints": [{
        "schemes": ["https://gtchannel.com/watch/*"],
        "url": "https://api.luminery.com/oembed"}]},
    {"provider_name": "Kooapp", "endpoints": [{
        "schemes": ["https://*.kooapp.com/koo/*"],
        "url": "https://embed.kooapp.com/services/oembed"}]},
    {"provider_name": "Minesweeper.today", "endpoints": [{
        "schemes": ["https://minesweeper.today/*"],
        "url": "https://minesweeper.today/api/oembed"}]},
    {"provider_name": "Jovian", "endpoints": [{
        "schemes": ["https://jovian.ai/viewer*",
                    "https://jovian.com/viewer*"],
        "url": "https://api.jovian.ai/oembed.json"}]},
    {"provider_name": "Qualifio", "endpoints": [{
        "schemes": ["https://qualifio.com/*"],
        "url": "https://oembed.qualifio.com/"}]},
]

# Batch 2 (round 5): the rest of the public providers.json long tail,
# reconstructed from the public registry dump.  Same shape and the same
# priority rule — appended after the corpus-verified providers, swapped
# out wholesale by ``load_registry()`` with a verbatim dump at deploy.
EXTRA_PROVIDERS += [
    {"provider_name": "Abraia", "endpoints": [{
        "schemes": ["https://store.abraia.me/*"],
        "url": "https://api.abraia.me/oembed"}]},
    {"provider_name": "AfreecaTV", "endpoints": [{
        "schemes": ["https://vod.afreecatv.com/player/*",
                    "https://v.afree.ca/*"],
        "url": "https://openapi.afreecatv.com/oembed/embedinfo"}]},
    {"provider_name": "Altium 365", "endpoints": [{
        "schemes": ["https://365.altium.com/files/*"],
        "url": "https://365.altium.com/files/oembed"}]},
    {"provider_name": "Altru", "endpoints": [{
        "schemes": ["https://app.altrulabs.com/*/*"],
        "url": "https://api.altrulabs.com/api/v1/social/oembed"}]},
    {"provider_name": "Animatron", "endpoints": [{
        "schemes": ["https://www.animatron.com/project/*",
                    "https://animatron.com/project/*"],
        "url": "https://animatron.com/oembed/json"}]},
    {"provider_name": "AnnieMusic", "endpoints": [{
        "schemes": ["https://anniemusic.app/t/*",
                    "https://anniemusic.app/p/*"],
        "url": "https://api.anniemusic.app/api/v1/oembed"}]},
    {"provider_name": "ArcGIS StoryMaps", "endpoints": [{
        "schemes": ["https://storymaps.arcgis.com/stories/*"],
        "url": "https://storymaps.arcgis.com/oembed"}]},
    {"provider_name": "Audioclip", "endpoints": [{
        "schemes": ["https://audioclip.naver.com/channels/*/clips/*",
                    "https://audioclip.naver.com/audiobooks/*"],
        "url": "https://audioclip.naver.com/oembed"}]},
    {"provider_name": "Avocode", "endpoints": [{
        "schemes": ["https://app.avocode.com/view/*"],
        "url": "https://stage-embed.avocode.com/api/oembed"}]},
    {"provider_name": "Backtracks", "endpoints": [{
        "schemes": ["https://backtracks.fm/*/*/e/*",
                    "https://backtracks.fm/*/s/*/*"],
        "url": "https://backtracks.fm/oembed"}]},
    {"provider_name": "Blackfire.io", "endpoints": [{
        "schemes": ["https://blackfire.io/profiles/*/graph",
                    "https://blackfire.io/profiles/compare/*/graph"],
        "url": "https://blackfire.io/api/v1/oembed"}]},
    {"provider_name": "Blogcast", "endpoints": [{
        "schemes": ["https://blogcast.host/embed/*"],
        "url": "https://backend.blogcast.host/oembed"}]},
    {"provider_name": "Bookingmood", "endpoints": [{
        "schemes": ["https://www.bookingmood.com/embed/*/*"],
        "url": "https://www.bookingmood.com/api/oembed"}]},
    {"provider_name": "Box Office Buz", "endpoints": [{
        "schemes": ["http://boxofficebuz.com/*",
                    "https://boxofficebuz.com/*"],
        "url": "https://boxofficebuz.com/oembed"}]},
    {"provider_name": "BrioVR", "endpoints": [{
        "schemes": ["https://view.briovr.com/*"],
        "url": "https://view.briovr.com/api/v1/worlds/oembed/"}]},
    {"provider_name": "Bumper", "endpoints": [{
        "schemes": ["https://app.bumper.com/embed/*"],
        "url": "https://app.bumper.com/oembed"}]},
    {"provider_name": "CatBoat", "endpoints": [{
        "schemes": ["http://img.catbo.at/*"],
        "url": "http://img.catbo.at/oembed.json"}]},
    {"provider_name": "Chainflix", "endpoints": [{
        "schemes": ["https://chainflix.net/video/*",
                    "https://chainflix.net/video/embed/*"],
        "url": "https://www.chainflix.net/video/oembed"}]},
    {"provider_name": "CHROCO", "endpoints": [{
        "schemes": ["https://chroco.ooo/mypage/*",
                    "https://chroco.ooo/story/*"],
        "url": "https://chroco.ooo/embed"}]},
    {"provider_name": "Clipland", "endpoints": [{
        "schemes": ["http://www.clipland.com/v/*",
                    "https://www.clipland.com/v/*"],
        "url": "https://www.clipland.com/api/oembed"}]},
    {"provider_name": "Codepoints", "endpoints": [{
        "schemes": ["https://codepoints.net/*",
                    "http://codepoints.net/*"],
        "url": "https://codepoints.net/api/v1/oembed"}]},
    {"provider_name": "Commaful", "endpoints": [{
        "schemes": ["https://commaful.com/play/*"],
        "url": "https://commaful.com/api/oembed/"}]},
    {"provider_name": "Cueup DJ Booking", "endpoints": [{
        "schemes": ["https://cueup.io/user/*/sounds/*"],
        "url": "https://cueup.io/api/oembed"}]},
    {"provider_name": "Curated", "endpoints": [{
        "schemes": ["https://*.curated.co/*"],
        "url": "https://api.curated.co/oembed"}]},
    {"provider_name": "Dadan", "endpoints": [{
        "schemes": ["https://www.dadan.io/watch/*",
                    "https://stage.dadan.io/watch/*"],
        "url": "https://www.dadan.io/api/video/oembed"}]},
    {"provider_name": "DALEXNI", "endpoints": [{
        "schemes": ["https://dalexni.com/i/*"],
        "url": "https://dalexni.com/oembed/"}]},
    {"provider_name": "Deseret News", "endpoints": [{
        "schemes": ["https://*.deseret.com/*"],
        "url": "https://embed.deseret.com/"}]},
    {"provider_name": "Digiteka", "endpoints": [{
        "schemes": ["https://www.ultimedia.com/central/video/edit/id/*/topic_id/*/",
                    "https://www.ultimedia.com/default/index/videogeneric/id/*"],
        "url": "https://www.ultimedia.com/api/search/oembed"}]},
    {"provider_name": "Docswell", "endpoints": [{
        "schemes": ["https://docswell.com/s/*/*",
                    "https://www.docswell.com/s/*/*"],
        "url": "https://www.docswell.com/service/oembed"}]},
    {"provider_name": "Dream Broker", "endpoints": [{
        "schemes": ["https://dreambroker.com/channel/*/*"],
        "url": "https://dreambroker.com/channel/oembed"}]},
    {"provider_name": "Edocr", "endpoints": [{
        "schemes": ["https://www.edocr.com/docs/*"],
        "url": "https://www.edocr.com/api/oembed"}]},
    {"provider_name": "EventLive", "endpoints": [{
        "schemes": ["https://evt.live/*", "https://evt.live/*/*"],
        "url": "https://evt.live/api/oembed"}]},
    {"provider_name": "everviz", "endpoints": [{
        "schemes": ["https://app.everviz.com/embed/*"],
        "url": "https://api.everviz.com/oembed"}]},
    {"provider_name": "Ex.Co", "endpoints": [{
        "schemes": ["https://app.ex.co/stories/*"],
        "url": "https://oembed.ex.co/item"}]},
    {"provider_name": "Eyrie", "endpoints": [{
        "schemes": ["https://eyrie.io/board/*",
                    "https://eyrie.io/sparkfun/*"],
        "url": "https://eyrie.io/v1/oembed"}]},
    {"provider_name": "Faithlife TV", "endpoints": [{
        "schemes": ["https://faithlifetv.com/items/*",
                    "https://faithlifetv.com/media/*"],
        "url": "https://faithlifetv.com/api/oembed"}]},
    {"provider_name": "Flat", "endpoints": [{
        "schemes": ["https://flat.io/score/*",
                    "https://*.flat.io/score/*"],
        "url": "https://flat.io/services/oembed"}]},
    {"provider_name": "FlippingBook", "endpoints": [{
        "schemes": ["https://online.flippingbook.com/view/*"],
        "url": "https://online.flippingbook.com/api/v1/oembed"}]},
    {"provider_name": "FOX SPORTS Australia", "endpoints": [{
        "schemes": ["http://fiso.foxsports.com.au/isomorphic-widget/*",
                    "https://fiso.foxsports.com.au/isomorphic-widget/*"],
        "url": "https://fiso.foxsports.com.au/oembed"}]},
    {"provider_name": "Framatube", "endpoints": [{
        "schemes": ["https://framatube.org/w/*",
                    "https://framatube.org/videos/watch/*"],
        "url": "https://framatube.org/services/oembed"}]},
    {"provider_name": "Geograph Germany", "endpoints": [{
        "schemes": ["http://geo-en.hlipp.de/*", "http://geo.hlipp.de/*",
                    "http://germany.geograph.org/*"],
        "url": "http://geo.hlipp.de/restapi.php/api/oembed"}]},
    {"provider_name": "Geograph Channel Islands", "endpoints": [{
        "schemes": ["http://*.geograph.org.gg/*",
                    "http://*.geograph.org.je/*",
                    "http://channel-islands.geograph.org/*"],
        "url": "http://www.geograph.org.gg/api/oembed"}]},
    {"provider_name": "Gifnote", "endpoints": [{
        "schemes": ["https://www.gifnote.com/play/*"],
        "url": "https://www.gifnote.com/services/oembed"}]},
    {"provider_name": "GloriaTV", "endpoints": [{
        "schemes": ["https://gloria.tv/*"],
        "url": "https://gloria.tv/oembed"}]},
    {"provider_name": "GMetri", "endpoints": [{
        "schemes": ["https://view.gmetri.com/*"],
        "url": "https://embed.gmetri.com/oembed/"}]},
    {"provider_name": "Gong", "endpoints": [{
        "schemes": ["https://app.gong.io/call?id=*"],
        "url": "https://app.gong.io/oembed"}]},
    {"provider_name": "Gumlet", "endpoints": [{
        "schemes": ["https://play.gumlet.io/embed/*"],
        "url": "https://api.gumlet.com/v1/oembed"}]},
    {"provider_name": "HASH", "endpoints": [{
        "schemes": ["https://core.hash.ai/@*/*"],
        "url": "https://api.hash.ai/oembed"}]},
    {"provider_name": "Heyzine", "endpoints": [{
        "schemes": ["https://heyzine.com/flip-book/*",
                    "https://*.hflip.co/*", "https://*.aflip.in/*"],
        "url": "https://heyzine.com/api1/oembed"}]},
    {"provider_name": "hihaho", "endpoints": [{
        "schemes": ["https://player.hihaho.com/*"],
        "url": "https://player.hihaho.com/services/oembed"}]},
    {"provider_name": "HiNative", "endpoints": [{
        "schemes": ["https://hinative.com/questions/*"],
        "url": "https://hinative.com/api/v1/oembed"}]},
    {"provider_name": "Homey", "endpoints": [{
        "schemes": ["https://homey.app/f/*", "https://homey.app/*/flow/*"],
        "url": "https://homey.app/api/oembed/flow"}]},
    {"provider_name": "Huffduffer", "endpoints": [{
        "schemes": ["http://huffduffer.com/*/*",
                    "https://huffduffer.com/*/*"],
        "url": "https://huffduffer.com/oembed"}]},
    {"provider_name": "Infoveave", "endpoints": [{
        "schemes": ["https://*.infoveave.net/E/*",
                    "https://*.infoveave.net/P/*"],
        "url": "https://infoveave.net/services/oembed"}]},
    {"provider_name": "Injurymap", "endpoints": [{
        "schemes": ["https://www.injurymap.com/exercises/*"],
        "url": "https://www.injurymap.com/services/oembed"}]},
    {"provider_name": "Inoreader", "endpoints": [{
        "schemes": ["https://www.inoreader.com/oembed/"],
        "url": "https://www.inoreader.com/oembed/api/"}]},
    {"provider_name": "inphood", "endpoints": [{
        "schemes": ["http://*.inphood.com/*"],
        "url": "http://api.inphood.com/oembed"}]},
    {"provider_name": "Kaltura", "endpoints": [{
        "schemes": ["https://*.kaltura.com/id/*"],
        "url": "https://videos.kaltura.com/oembed"}]},
    {"provider_name": "Kidoju", "endpoints": [{
        "schemes": ["https://www.kidoju.com/en/x/*/*",
                    "https://www.kidoju.com/fr/x/*/*"],
        "url": "https://www.kidoju.com/api/oembed"}]},
    {"provider_name": "Kitchenbowl", "endpoints": [{
        "schemes": ["http://www.kitchenbowl.com/recipe/*"],
        "url": "http://www.kitchenbowl.com/oembed"}]},
    {"provider_name": "Kuula", "endpoints": [{
        "schemes": ["https://kuula.co/post/*",
                    "https://kuula.co/share/*"],
        "url": "https://kuula.co/oembed"}]},
    {"provider_name": "Kurozora", "endpoints": [{
        "schemes": ["https://kurozora.app/episodes/*",
                    "https://kurozora.app/songs/*"],
        "url": "https://kurozora.app/oembed"}]},
    {"provider_name": "LeMans.Pod", "endpoints": [{
        "schemes": ["https://umotion-test.univ-lemans.fr/video/*"],
        "url": "https://umotion-test.univ-lemans.fr/oembed"}]},
    {"provider_name": "Lille.Pod", "endpoints": [{
        "schemes": ["https://pod.univ-lille.fr/video/*"],
        "url": "https://pod.univ-lille.fr/oembed"}]},
    {"provider_name": "Ludus", "endpoints": [{
        "schemes": ["https://app.ludus.one/*"],
        "url": "https://app.ludus.one/oembed"}]},
    {"provider_name": "MathEmbed", "endpoints": [{
        "schemes": ["http://mathembed.com/latex?inputText=*",
                    "http://mathembed.com/latex?inputText=*"],
        "url": "http://mathembed.com/oembed"}]},
    {"provider_name": "Medienarchiv der Kuenste", "endpoints": [{
        "schemes": ["https://medienarchiv.zhdk.ch/entries/*"],
        "url": "https://medienarchiv.zhdk.ch/oembed.json"}]},
    {"provider_name": "Meetup", "endpoints": [{
        "schemes": ["http://meetup.com/*", "https://www.meetup.com/*",
                    "https://meetup.com/*", "http://meetu.ps/*"],
        "url": "https://api.meetup.com/oembed"}]},
    {"provider_name": "Meme", "endpoints": [{
        "schemes": ["http://me.me/i/*", "https://me.me/i/*"],
        "url": "https://me.me/oembed"}]},
    {"provider_name": "Mermaid Ink", "endpoints": [{
        "schemes": ["https://mermaid.ink/img/*",
                    "https://mermaid.ink/svg/*"],
        "url": "https://mermaid.ink/services/oembed"}]},
    {"provider_name": "Miro", "endpoints": [{
        "schemes": ["https://miro.com/app/board/*"],
        "url": "https://miro.com/api/v1/oembed"}]},
    {"provider_name": "myBeweeg", "endpoints": [{
        "schemes": ["https://mybeweeg.com/w/*"],
        "url": "https://mybeweeg.com/services/oembed"}]},
    {"provider_name": "Namchey", "endpoints": [{
        "schemes": ["https://namchey.com/embeds/*"],
        "url": "https://namchey.com/api/oembed"}]},
    {"provider_name": "Natural Atlas", "endpoints": [{
        "schemes": ["https://naturalatlas.com/*/*",
                    "https://naturalatlas.com/*/*/*"],
        "url": "https://naturalatlas.com/oembed.json"}]},
    {"provider_name": "NoPaste", "endpoints": [{
        "schemes": ["https://nopaste.ml/*"],
        "url": "https://oembed.nopaste.ml"}]},
    {"provider_name": "Noteflight", "endpoints": [{
        "schemes": ["http://*.noteflight.com/scores/view/*",
                    "https://*.noteflight.com/scores/view/*"],
        "url": "https://www.noteflight.com/services/oembed"}]},
    {"provider_name": "Odds.com.au", "endpoints": [{
        "schemes": ["https://www.odds.com.au/*"],
        "url": "https://www.odds.com.au/api/oembed/"}]},
    {"provider_name": "Official FM", "endpoints": [{
        "schemes": ["http://official.fm/tracks/*",
                    "http://official.fm/playlists/*"],
        "url": "http://official.fm/services/oembed.json"}]},
    {"provider_name": "Omniscope", "endpoints": [{
        "schemes": ["https://omniscope.me/*"],
        "url": "https://omniscope.me/_global_/oembed/json"}]},
    {"provider_name": "Omny Studio", "endpoints": [{
        "schemes": ["https://omny.fm/shows/*"],
        "url": "https://omny.fm/oembed"}]},
    {"provider_name": "Orbitvu", "endpoints": [{
        "schemes": ["https://orbitvu.co/001/*/ov3601/view",
                    "https://orbitvu.co/001/*/2/orbittour/*/view"],
        "url": "https://orbitvu.co/service/oembed"}]},
    {"provider_name": "Outplayed.tv", "endpoints": [{
        "schemes": ["https://outplayed.tv/media/*"],
        "url": "https://outplayed.tv/oembed"}]},
    {"provider_name": "OZ", "endpoints": [{
        "schemes": ["https://www.oz.com/*/video/*"],
        "url": "https://core.oz.com/oembed"}]},
    {"provider_name": "Panda Video", "endpoints": [{
        "schemes": ["https://*.pandavideo.com.br/embed/*"],
        "url": "https://api-v2.pandavideo.com.br/oembed"}]},
    {"provider_name": "Photobucket", "endpoints": [{
        "schemes": ["http://photobucket.com/albums/*",
                    "http://photobucket.com/groups/*"],
        "url": "http://api.photobucket.com/oembed"}]},
    {"provider_name": "Picturelfy", "endpoints": [{
        "schemes": ["https://www.picturelfy.com/p/*"],
        "url": "https://www.picturelfy.com/service/oembed"}]},
    {"provider_name": "Pinpoll", "endpoints": [{
        "schemes": ["https://tools.pinpoll.com/embed/*"],
        "url": "https://tools.pinpoll.com/oembed"}]},
    {"provider_name": "PitchHub", "endpoints": [{
        "schemes": ["https://player.pitchhub.com/en/public/player/*"],
        "url": "https://player.pitchhub.com/en/public/oembed"}]},
    {"provider_name": "Pixdor", "endpoints": [{
        "schemes": ["http://store.pixdor.com/place-marker-widget/*/show",
                    "http://store.pixdor.com/map/*/show"],
        "url": "http://store.pixdor.com/oembed"}]},
    {"provider_name": "Plusdocs", "endpoints": [{
        "schemes": ["https://app.plusdocs.com/*/snapshots/*",
                    "https://app.plusdocs.com/*/pages/edit/*",
                    "https://app.plusdocs.com/*/pages/share/*"],
        "url": "https://app.plusdocs.com/oembed"}]},
    {"provider_name": "Puzzel.org", "endpoints": [{
        "schemes": ["https://puzzel.org/en/*/play?p=*",
                    "https://puzzel.org/*/embed?p=*"],
        "url": "https://puzzel.org/services/oembed"}]},
    {"provider_name": "Quiz.biz", "endpoints": [{
        "schemes": ["http://www.quiz.biz/quizz-*.html"],
        "url": "http://www.quiz.biz/api/oembed"}]},
    {"provider_name": "Quizz.biz", "endpoints": [{
        "schemes": ["http://www.quizz.biz/quizz-*.html"],
        "url": "http://www.quizz.biz/api/oembed"}]},
    {"provider_name": "Raindrop", "endpoints": [{
        "schemes": ["https://raindrop.io/*", "https://raindrop.io/*/*",
                    "https://raindrop.io/*/*/*/*"],
        "url": "https://pub.raindrop.io/api/oembed"}]},
    {"provider_name": "rcvis", "endpoints": [{
        "schemes": ["https://www.rcvis.com/v/*",
                    "https://www.rcvis.com/visualize=*",
                    "https://www.rcvis.com/ve/*"],
        "url": "https://www.rcvis.com/oembed"}]},
    {"provider_name": "ReleaseWire", "endpoints": [{
        "schemes": ["http://rwire.com/*"],
        "url": "http://publisher.releasewire.com/oembed/"}]},
    {"provider_name": "Roomshare", "endpoints": [{
        "schemes": ["http://roomshare.jp/post/*",
                    "http://roomshare.jp/en/post/*"],
        "url": "http://roomshare.jp/en/oembed.json"}]},
    {"provider_name": "RoosterTeeth", "endpoints": [{
        "schemes": ["https://roosterteeth.com/*"],
        "url": "https://roosterteeth.com/oembed"}]},
    {"provider_name": "Saooti", "endpoints": [{
        "schemes": ["https://octopus.saooti.com/main/pub/podcast/*"],
        "url": "https://octopus.saooti.com/oembed"}]},
    {"provider_name": "Sapo Videos", "endpoints": [{
        "schemes": ["http://videos.sapo.pt/*"],
        "url": "http://videos.sapo.pt/oembed"}]},
    {"provider_name": "Screen9", "endpoints": [{
        "schemes": ["https://console.screen9.com/*",
                    "https://*.screen9.tv/*"],
        "url": "https://api.screen9.com/oembed"}]},
    {"provider_name": "ScribbleMaps", "endpoints": [{
        "schemes": ["http://www.scribblemaps.com/maps/view/*",
                    "https://www.scribblemaps.com/maps/view/*",
                    "http://scribblemaps.com/maps/view/*",
                    "https://scribblemaps.com/maps/view/*"],
        "url": "https://scribblemaps.com/api/services/oembed.json"}]},
    {"provider_name": "SendtoNews", "endpoints": [{
        "schemes": ["http://embed.sendtonews.com/oembed/*"],
        "url": "https://embed.sendtonews.com/services/oembed"}]},
    {"provider_name": "ShortNote", "endpoints": [{
        "schemes": ["https://www.shortnote.jp/view/notes/*"],
        "url": "https://www.shortnote.jp/oembed/"}]},
    {"provider_name": "Shoudio", "endpoints": [{
        "schemes": ["http://shoudio.com/*", "http://shoud.io/*"],
        "url": "http://shoudio.com/api/oembed"}]},
    {"provider_name": "Show by Animaker", "endpoints": [{
        "schemes": ["https://app.getshow.io/iframe/*"],
        "url": "https://api.getshow.io/oembed.json"}]},
    {"provider_name": "Show the Way", "endpoints": [{
        "schemes": ["https://showtheway.io/to/*"],
        "url": "https://showtheway.io/oembed"}]},
    {"provider_name": "Sizzle", "endpoints": [{
        "schemes": ["https://onsizzle.com/i/*"],
        "url": "https://onsizzle.com/oembed"}]},
    {"provider_name": "SmashNotes", "endpoints": [{
        "schemes": ["https://smashnotes.com/p/*",
                    "https://smashnotes.com/p/*/e/*"],
        "url": "https://smashnotes.com/services/oembed"}]},
    {"provider_name": "SoundsGood", "endpoints": [{
        "schemes": ["https://play.soundsgood.co/playlist/*"],
        "url": "https://play.soundsgood.co/oembed"}]},
    {"provider_name": "Spotlightr", "endpoints": [{
        "schemes": ["https://*.spotlightr.com/watch/*",
                    "https://*.spotlightr.com/publish/*"],
        "url": "https://api.spotlightr.com/getOEmbed"}]},
    {"provider_name": "Stornaway", "endpoints": [{
        "schemes": ["https://player.stornaway.io/watch/*"],
        "url": "https://player.stornaway.io/api/v1/oembed"}]},
    {"provider_name": "Streamio", "endpoints": [{
        "schemes": ["https://s3m.io/*", "https://23m.io/*"],
        "url": "https://streamio.com/api/v1/oembed.json"}]},
    {"provider_name": "Subscribi", "endpoints": [{
        "schemes": ["https://subscribi.io/api/oembed*"],
        "url": "https://subscribi.io/api/oembed"}]},
    {"provider_name": "Sudomemo", "endpoints": [{
        "schemes": ["https://www.sudomemo.net/watch/*",
                    "http://www.sudomemo.net/watch/*"],
        "url": "https://www.sudomemo.net/oembed"}]},
    {"provider_name": "They Said So", "endpoints": [{
        "schemes": ["https://theysaidso.com/image/*"],
        "url": "https://theysaidso.com/extensions/oembed"}]},
    {"provider_name": "TickCounter", "endpoints": [{
        "schemes": ["https://www.tickcounter.com/countdown/*",
                    "https://www.tickcounter.com/countup/*",
                    "https://www.tickcounter.com/worldclock/*",
                    "https://www.tickcounter.com/ticker/*"],
        "url": "https://www.tickcounter.com/oembed"}]},
    {"provider_name": "Topy", "endpoints": [{
        "schemes": ["https://www.topy.se/image/*"],
        "url": "https://www.topy.se/oembed/"}]},
    {"provider_name": "Trinity Audio", "endpoints": [{
        "schemes": ["https://trinitymedia.ai/player/*"],
        "url": "https://trinitymedia.ai/player/trinity-oembed"}]},
    {"provider_name": "tvcf", "endpoints": [{
        "schemes": ["https://play.tvcf.co.kr/*"],
        "url": "https://play.tvcf.co.kr/rest/oembed"}]},
    {"provider_name": "Twinmotion", "endpoints": [{
        "schemes": ["https://twinmotion.unrealengine.com/presentation/*",
                    "https://twinmotion.unrealengine.com/panorama/*"],
        "url": "https://twinmotion.unrealengine.com/oembed"}]},
    {"provider_name": "Typlog", "endpoints": [{
        "schemes": ["https://typlog.com/*/*"],
        "url": "https://typlog.com/oembed"}]},
    {"provider_name": "UAPod", "endpoints": [{
        "schemes": ["https://uapod.univ-antilles.fr/video/*"],
        "url": "https://uapod.univ-antilles.fr/oembed"}]},
    {"provider_name": "University of Cambridge Map", "endpoints": [{
        "schemes": ["https://map.cam.ac.uk/*"],
        "url": "https://map.cam.ac.uk/oembed/"}]},
    {"provider_name": "UnivParis1.Pod", "endpoints": [{
        "schemes": ["https://mediatheque.univ-paris1.fr/video/*"],
        "url": "https://mediatheque.univ-paris1.fr/oembed"}]},
    {"provider_name": "UOL", "endpoints": [{
        "schemes": ["https://*.uol.com.br/view/*",
                    "https://*.uol.com.br/video/*"],
        "url": "https://mais.uol.com.br/apiuol/v3/oembed/view"}]},
    {"provider_name": "Upec.Pod", "endpoints": [{
        "schemes": ["https://pod.u-pec.fr/video/*"],
        "url": "https://pod.u-pec.fr/oembed"}]},
    {"provider_name": "uStudio", "endpoints": [{
        "schemes": ["https://*.ustudio.com/embed/*"],
        "url": "https://app.ustudio.com/api/v2/oembed"}]},
    {"provider_name": "Utposts", "endpoints": [{
        "schemes": ["https://www.utposts.com/products/*",
                    "https://utposts.com/products/*"],
        "url": "https://www.utposts.com/api/oembed"}]},
    {"provider_name": "VeeR VR", "endpoints": [{
        "schemes": ["https://veer.tv/videos/*",
                    "https://veervr.tv/videos/*"],
        "url": "https://api.veer.tv/oembed"}]},
    {"provider_name": "VEVO", "endpoints": [{
        "schemes": ["http://www.vevo.com/*", "https://www.vevo.com/*"],
        "url": "https://embed.vevo.com/oembed"}]},
    {"provider_name": "Viddler", "endpoints": [{
        "schemes": ["http://www.viddler.com/v/*"],
        "url": "http://www.viddler.com/oembed/"}]},
    {"provider_name": "Videfit", "endpoints": [{
        "schemes": ["https://videfit.com/videos/*"],
        "url": "https://videfit.com/oembed"}]},
    {"provider_name": "VidMount", "endpoints": [{
        "schemes": ["https://vidmount.com/*"],
        "url": "https://vidmount.com/oembed"}]},
    {"provider_name": "Viously", "endpoints": [{
        "schemes": ["https://www.viously.com/*/*"],
        "url": "https://www.viously.com/oembed"}]},
    {"provider_name": "Vizydrop", "endpoints": [{
        "schemes": ["https://vizydrop.com/shared/*"],
        "url": "https://vizydrop.com/oembed"}]},
    {"provider_name": "Vouch", "endpoints": [{
        "schemes": ["https://*.vouchfor.com/*"],
        "url": "https://embed.vouchfor.com/v1/oembed"}]},
    {"provider_name": "VoxSnap", "endpoints": [{
        "schemes": ["https://article.voxsnap.com/*/*"],
        "url": "https://data.voxsnap.com/oembed"}]},
    {"provider_name": "Wave.video", "endpoints": [{
        "schemes": ["https://watch.wave.video/*",
                    "https://embed.wave.video/*"],
        "url": "https://embed.wave.video/oembed"}]},
    {"provider_name": "Waltrack", "endpoints": [{
        "schemes": ["https://waltrack.net/product/*"],
        "url": "https://waltrack.net/oembed"}]},
    {"provider_name": "Web3 is Going Just Great", "endpoints": [{
        "schemes": ["https://www.web3isgoinggreat.com/?id=*",
                    "https://www.web3isgoinggreat.com/single/*"],
        "url": "https://www.web3isgoinggreat.com/api/oembed"}]},
    {"provider_name": "wecandeo", "endpoints": [{
        "schemes": ["https://play.wecandeo.com/video/v/*"],
        "url": "https://play.wecandeo.com/oembed"}]},
    {"provider_name": "Whooshkaa", "endpoints": [{
        "schemes": ["https://player.whooshkaa.com/episode?id=*",
                    "https://player.whooshkaa.com/shows/*"],
        "url": "https://api.whooshkaa.com/oembed"}]},
    {"provider_name": "Wizer", "endpoints": [{
        "schemes": ["https://*.wizer.me/learn/*",
                    "https://*.wizer.me/preview/*"],
        "url": "https://app.wizer.me/api/oembed.json"}]},
    {"provider_name": "Zingsoft", "endpoints": [{
        "schemes": ["https://app.zingsoft.com/embed/*",
                    "https://app.zingsoft.com/view/*"],
        "url": "https://app.zingsoft.com/oembed"}]},
    {"provider_name": "JDoodle", "endpoints": [{
        "schemes": ["https://www.jdoodle.com/embed/*"],
        "url": "https://www.jdoodle.com/api/oembed"}]},
]
